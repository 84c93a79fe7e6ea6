"""fastText-style hashed character-n-gram language detector -- the
production-fast twin of the relational `langid_hashed_ngram` query.

Model (public fastText idea, re-expressed): char n-grams (n = 2,3,4) of the
normalized text are hashed into 2^18 buckets with a vectorized polynomial
rolling hash (pure numpy -- no per-gram Python call); each language stores
add-one-smoothed log-probabilities for its observed buckets as a pair of
sorted numpy arrays, looked up batch-wise with ``np.searchsorted``.  Score =
mean bucket log-prob; prediction = argmax with (score desc, language asc)
tie-break and a margin-based confidence.

Everything is deterministic (no RNG); the slow reference twin
``score_text_slow`` computes the same numbers with Python loops for
differential testing.
"""

from __future__ import annotations

import math

import numpy as np

N_BUCKETS_LOG2 = 18
N_BUCKETS = 1 << N_BUCKETS_LOG2
_MASK = N_BUCKETS - 1
_BASE = np.uint64(1000003)
NGRAM_SIZES = (2, 3, 4)


def _normalize(text: str) -> str:
    return " ".join(text.lower().split())


def _codepoints(text: str) -> np.ndarray:
    return np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(
        np.uint64
    )


def _gram_buckets(cp: np.ndarray, n: int) -> np.ndarray:
    """Vectorized polynomial hash of every char n-gram: bucket_i =
    (sum_j cp[i+j] * BASE^(n-1-j)) & MASK, computed with shifted adds."""
    if len(cp) < n:
        return np.empty(0, dtype=np.uint64)
    h = cp[: len(cp) - n + 1].copy()
    for j in range(1, n):
        h = h * _BASE + cp[j : len(cp) - n + 1 + j]
    return h & np.uint64(_MASK)


def text_buckets(text: str) -> np.ndarray:
    cp = _codepoints(_normalize(text))
    parts = [_gram_buckets(cp, n) for n in NGRAM_SIZES]
    return np.concatenate(parts) if parts else np.empty(0, dtype=np.uint64)


class HashedNgramModel:
    """Per-language (sorted buckets, logps, backoff) tables."""

    def __init__(self, langs: list[str], tables: dict[str, tuple],
                 backoff: dict[str, float]) -> None:
        self.langs = langs          # sorted -- the tie-break order
        self.tables = tables        # lang -> (sorted buckets u64, logp f64)
        self.backoff = backoff

    @classmethod
    def train(cls, rows: list[tuple[str, str]], alpha: float = 1.0
              ) -> "HashedNgramModel":
        counts: dict[str, dict[int, int]] = {}
        for lang, text in rows:
            bag = counts.setdefault(lang, {})
            for b in text_buckets(text).tolist():
                bag[b] = bag.get(b, 0) + 1
        return cls.from_counts(counts, alpha)

    @classmethod
    def from_counts(cls, counts: dict[str, dict[int, int]],
                    alpha: float = 1.0) -> "HashedNgramModel":
        """Build from per-language bucket counts -- the entry point for the
        DISTRIBUTED trainer (integer counts in, one math.log per entry, so
        driver-side and distributed training are bit-identical)."""
        langs = sorted(counts)
        tables, backoff = {}, {}
        for lang in langs:
            bag = counts[lang]
            total = sum(bag.values())
            vsize = len(bag) + 1
            denom = total + alpha * vsize
            buckets = np.array(sorted(bag), dtype=np.uint64)
            logps = np.array(
                [math.log((bag[int(b)] + alpha) / denom) for b in buckets],
                dtype=np.float64,
            )
            tables[lang] = (buckets, logps)
            backoff[lang] = math.log(alpha / denom)
        return cls(langs, tables, backoff)

    def __getstate__(self):
        return (self.langs, self.tables, self.backoff)

    def __setstate__(self, state):
        self.langs, self.tables, self.backoff = state

    # -- scoring ------------------------------------------------------------

    def _mean_logps(self, bs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Per-language (mean bucket log-prob, prior-corrected mean) for one
        text's buckets, ordered like ``self.langs``.  The corrected mean is
        ``mean(where(hit, logp - backoff, 0))`` — computed on the deltas, not
        as ``mean - backoff``, so an all-miss text is EXACTLY 0.0 for every
        language (no float residue to perturb the argmax tie-break)."""
        means = np.empty(len(self.langs), dtype=np.float64)
        pcs = np.empty(len(self.langs), dtype=np.float64)
        for i, lang in enumerate(self.langs):
            buckets, logps = self.tables[lang]
            bo = self.backoff[lang]
            idx = np.searchsorted(buckets, bs)
            idx_c = np.minimum(idx, len(buckets) - 1)
            hit = buckets[idx_c] == bs
            means[i] = np.where(hit, logps[idx_c], bo).mean()
            pcs[i] = np.where(hit, logps[idx_c] - bo, 0.0).mean()
        return means, pcs

    @staticmethod
    def _argmax_margin(scores: np.ndarray,
                       langs: list[str]) -> tuple[str, float, float]:
        """Winner with (score desc, language asc) tie-break: langs is
        sorted ascending and np.argmax returns the FIRST max index."""
        i = int(np.argmax(scores))
        best = float(scores[i])
        if len(scores) > 1:
            rest = np.delete(scores, i)
            margin = best - float(rest.max())
        else:
            margin = 0.0
        return langs[i], best, margin

    def score_all(self, text: str):
        """One pass over languages → both scorings of one text:
        ``((lang, score, margin), (pc_lang, pc_score, pc_margin))``.

        The *plain* score is the mean bucket log-prob (what the reference's
        sum-of-word-scores argmax morally is, `Language.scala:350-361`).  Its
        known failure mode: fully-OOV text scores ``backoff[lang]`` for every
        gram, so the argmax degenerates to "which language has the
        least-negative backoff" = smallest table.  The *prior-corrected* (pc)
        score subtracts that per-language baseline — ``mean_logp -
        backoff[lang]`` — so an all-OOV text scores exactly 0.0 for every
        language (winner = alphabetically-first language with pc_margin 0.0;
        consumers gate on the margin) and in-vocabulary evidence is measured
        relative to each language's own smoothing floor.
        """
        bs = text_buckets(text)
        if len(bs) == 0:
            return (None, 0.0, 0.0), (None, 0.0, 0.0)
        means, corrected = self._mean_logps(bs)
        plain = self._argmax_margin(means, self.langs)
        pc = self._argmax_margin(corrected, self.langs)
        return plain, pc

    def score_text(self, text: str) -> tuple[str | None, float, float]:
        """(lang, mean_logp, margin_to_second); None for gram-less text."""
        return self.score_all(text)[0]

    def score_text_pc(self, text: str) -> tuple[str | None, float, float]:
        """Prior-corrected scoring only (see ``score_all``)."""
        return self.score_all(text)[1]

    def score_text_slow(self, text: str) -> tuple[str | None, float]:
        """Loop-based reference twin for differential tests."""
        bs = [int(b) for b in text_buckets(text)]
        if not bs:
            return None, 0.0
        best_lang, best = None, -np.inf
        for lang in self.langs:
            buckets, logps = self.tables[lang]
            table = {int(b): float(p) for b, p in zip(buckets, logps)}
            bo = self.backoff[lang]
            score = float(np.mean([table.get(b, bo) for b in bs]))
            if score > best:
                best_lang, best = lang, score
        return best_lang, best


def train_hashed_ngram_distributed(labeled, lang_col: str = "language",
                                   text_col: str = "text",
                                   alpha: float = 1.0) -> HashedNgramModel:
    """Train from a (language, text) DataFrame WITHOUT collecting the
    corpus: per-batch (language, bucket) Counters -> groupBy sum -> only
    the model-sized count table reaches the driver (<= langs * 2^18 rows).
    Bit-identical to ``HashedNgramModel.train`` on the same rows."""

    def run(batches):
        from collections import Counter

        import pandas as pd

        agg: Counter = Counter()
        seen: set = set()
        for pdf in batches:
            for lang, text in zip(pdf[lang_col], pdf[text_col]):
                seen.add(lang)
                for b in text_buckets(
                    text if isinstance(text, str) else ""
                ).tolist():
                    agg[(lang, b)] += 1
        # b = -1 marker registers languages whose every text yielded zero
        # buckets (real buckets are >= 0): the local twin's per-row
        # counts.setdefault registers them, so 'bit-identical to train'
        # must too (an unregistered language would silently drop out of
        # langs/tables/backoff)
        for lang in seen:
            agg.setdefault((lang, -1), 0)
        yield pd.DataFrame({
            "language": [k[0] for k in agg],
            "b": [k[1] for k in agg],
            "c": list(agg.values()),
        })

    from pyspark.sql import functions as F

    rows = (
        labeled.mapInPandas(run, "language string, b long, c long")
        .groupBy("language", "b").agg(F.sum("c").alias("c"))
        .collect()
    )
    counts: dict[str, dict[int, int]] = {}
    for r in rows:
        bag = counts.setdefault(r["language"], {})
        if int(r["b"]) >= 0:
            bag[int(r["b"])] = int(r["c"])
    return HashedNgramModel.from_counts(counts, alpha)


def langid_fasttext_df(docs, model_bc, id_col: str = "doc_id",
                       text_col: str = "text"):
    """Distributed scorer: mapInPandas over Arrow batches, broadcast model."""

    def run(batches):
        import pandas as pd

        m = model_bc.value if hasattr(model_bc, "value") else model_bc
        for pdf in batches:
            cols = {k: [] for k in ("ft_lang", "ft_score", "ft_margin",
                                    "ft_lang_pc", "ft_score_pc",
                                    "ft_margin_pc")}
            for text in pdf[text_col]:
                plain, pc = m.score_all(
                    text if isinstance(text, str) else ""
                )
                cols["ft_lang"].append(plain[0])
                cols["ft_score"].append(round(plain[1], 6))
                cols["ft_margin"].append(round(plain[2], 6))
                cols["ft_lang_pc"].append(pc[0])
                cols["ft_score_pc"].append(round(pc[1], 6))
                cols["ft_margin_pc"].append(round(pc[2], 6))
            yield pd.DataFrame({"doc_id": pdf[id_col], **cols})

    return docs.mapInPandas(
        run,
        schema=("doc_id long, ft_lang string, ft_score double, "
                "ft_margin double, ft_lang_pc string, ft_score_pc double, "
                "ft_margin_pc double"),
    )
