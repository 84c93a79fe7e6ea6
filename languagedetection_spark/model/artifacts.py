"""Frozen model artifacts: build once, ship with spark-submit, broadcast.

The north rule's deployment shape is ``spark-submit --py-files pkg.zip``
plus model artifacts loaded at driver start and broadcast to executors.
This module gives FilterModel a durable, versioned on-disk form (one JSON
file: vocabulary + trigram tables + fingerprint) so a training job and a
filter job can exchange models without re-training.

JSON keeps the artifact engine-neutral and diffable; floats round-trip
exactly (json repr of Python floats is shortest-exact).
"""

from __future__ import annotations

import gzip
import json

from ..functions.kernels import FilterModel
from ..sources.checkpoint import model_fingerprint

FORMAT_VERSION = 1


def save_model(model: FilterModel, path: str) -> str:
    """Write the model as gzipped JSON; returns its fingerprint."""
    fp = model_fingerprint(model)
    payload = {
        "format_version": FORMAT_VERSION,
        "fingerprint": fp,
        "vocab": model.vocab,
        "tri_logprob": model.tri_logprob,
        "tri_backoff": model.tri_backoff,
    }
    with gzip.open(path, "wt", encoding="utf-8") as f:
        json.dump(payload, f, ensure_ascii=False)
    return fp


def load_model(path: str) -> FilterModel:
    with gzip.open(path, "rt", encoding="utf-8") as f:
        payload = json.load(f)
    if payload.get("format_version") != FORMAT_VERSION:
        raise ValueError(
            f"unsupported model artifact version: "
            f"{payload.get('format_version')!r}"
        )
    model = FilterModel(
        payload["vocab"], payload["tri_logprob"], payload["tri_backoff"]
    )
    got = model_fingerprint(model)
    want = payload["fingerprint"]
    if got != want:
        raise ValueError(
            f"model artifact fingerprint mismatch: file says {want}, "
            f"content hashes to {got} (corrupt or hand-edited artifact)"
        )
    return model
