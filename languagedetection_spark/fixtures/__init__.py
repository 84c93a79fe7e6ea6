from .generate import (
    gen_labeled_corpus,
    gen_lexicons,
    gen_transcripts,
    write_parquet_fixtures,
)
