"""Pure-Python (no Spark) oracle for the sequential mean-adjust fold.

Shared by tools/gen_fold_goldens.py (which freezes golden rows into
fold_goldens.py) and entry_queries (which validates the frozen goldens
against the LIVE testdata fingerprint and recomputes on mismatch, so a
regenerated fixture can never turn the gate red with stale goldens).
"""

from __future__ import annotations

import os


def pure_fold_rows(sf_dir: str) -> list[tuple[str, str, float, bool]]:
    """The sequential reference fold over one sf's documents table --
    independent of every Spark code path (refmodel only)."""
    import pyarrow.parquet as pq

    from ..refmodel.alphabets import ISO_TO_LANGUAGE
    from ..refmodel.classifier import Vocabulary

    rows = sorted(
        pq.read_table(os.path.join(sf_dir, "documents.parquet")).to_pylist(),
        key=lambda r: r["doc_id"],
    )
    v = Vocabulary()
    for r in rows:
        if r["source"] == "src0":
            lang = ISO_TO_LANGUAGE.get(r["lang"])
            if lang is not None:
                v.load_labeled(lang, r["text"])
    for r in rows:
        if r["source"] != "src0":
            v.classify(r["text"], adjust=True)
    return [(l, w, round(s, 6), a) for l, w, s, a in v.rows()]


def axiom_distribution_rows(
    fold: list[tuple[str, str, float, bool]],
) -> list[tuple[str, int, int]]:
    """(language, n_axioms, n_inductions != 0) over the fold output --
    op-19 (TrainingResult.scala:66-79) semantics."""
    agg: dict[str, list[int]] = {}
    for lang, _w, score, is_axiom in fold:
        a = agg.setdefault(lang, [0, 0])
        if is_axiom:
            a[0] += 1
        elif score != 0.0:
            a[1] += 1
    return [(lang, a[0], a[1]) for lang, a in sorted(agg.items())]


def sf_key(sf_dir: str) -> int:
    """Per-sf selector for the golden SQL: the lineitem row count (6000 /
    60000 / 600000 -- unique per driver sf, unlike the documents count)."""
    import pyarrow.parquet as pq

    return pq.read_metadata(
        os.path.join(sf_dir, "lineitem.parquet")
    ).num_rows


def doc_fingerprint(sf_dir: str) -> str:
    """Logical md5 over the sorted documents rows -- detects a regenerated
    fixture even when file-level metadata differs."""
    import hashlib

    import pyarrow.parquet as pq

    rows = sorted(
        pq.read_table(os.path.join(sf_dir, "documents.parquet")).to_pylist(),
        key=lambda r: r["doc_id"],
    )
    h = hashlib.md5()
    for r in rows:
        h.update(
            f"{r['doc_id']}\x00{r['lang']}\x00{r['source']}\x00{r['text']}\x01"
            .encode()
        )
    return h.hexdigest()


_CURRENT_CACHE: dict = {}


def default_root() -> str:
    """Testdata root to validate goldens against: derived from the sf dir
    actually being exercised (``SPARK_GRAFT_SF_DIR``) when set, so a
    contract run pointed at a non-default testdata tree validates THAT
    tree instead of a hardcoded constant (ADVICE r2)."""
    sf = os.environ.get("SPARK_GRAFT_SF_DIR")
    if sf:
        return os.path.dirname(os.path.abspath(sf.rstrip("/")))
    return "/root/testdata"


def current_goldens(
    root: str | None = None,
    sfs: tuple[str, ...] = ("sf0.001", "sf0.01", "sf0.1"),
) -> tuple[dict[int, list], dict[int, list]]:
    """(fold_goldens, axiom_dist_goldens) per sf key, VALIDATED against the
    live testdata: frozen rows where the documents fingerprint still
    matches, live pure-fold recompute where it does not (or the key is
    new).  Keys whose sf dirs are absent fall back to the frozen rows."""
    if root is None:
        root = default_root()
        env_sf = os.environ.get("SPARK_GRAFT_SF_DIR")
        if env_sf:  # validate the exercised dir even under a custom name
            base = os.path.basename(os.path.abspath(env_sf.rstrip("/")))
            if base not in sfs:
                sfs = sfs + (base,)
    cached = _CURRENT_CACHE.get((root, sfs))
    if cached is not None:
        return cached

    from .fold_goldens import (
        AXIOM_DIST_GOLDENS,
        DOC_FINGERPRINTS,
        FOLD_GOLDENS,
    )

    folds: dict[int, list] = dict(FOLD_GOLDENS)
    dists: dict[int, list] = dict(AXIOM_DIST_GOLDENS)
    for sf in sfs:
        sf_dir = os.path.join(root, sf)
        if not os.path.isdir(sf_dir):
            continue
        try:
            key = sf_key(sf_dir)
            if DOC_FINGERPRINTS.get(key) == doc_fingerprint(sf_dir):
                continue  # frozen golden still valid
            fold = pure_fold_rows(sf_dir)
        except Exception:  # unreadable dir: keep frozen goldens
            continue
        folds[key] = fold
        dists[key] = axiom_distribution_rows(fold)
    _CURRENT_CACHE[(root, sfs)] = (folds, dists)
    return folds, dists
