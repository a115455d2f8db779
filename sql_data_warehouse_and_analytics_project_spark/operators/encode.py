"""External-encoder plug-through for the embedding path.

``hashembed.py`` generates vectors with pure relational ops (the
oracle-backed path); THIS module is the seam where a real model encoder
plugs in: :func:`encode_documents` runs an arbitrary batch encoder
(pandas Series of texts -> ``(n, dim)`` float array) through
Arrow-batched ``mapInPandas`` and emits vectors under the SAME contract
every downstream vector consumer (ANN brute/IVF/PQ/SQ/OPQ, k-means,
SemDeDup, triplet mining, quantization calibration) already assumes
about the ``embeddings`` table:

* schema ``(doc_id bigint, embedding array<float>)`` — rename
  ``doc_id`` → ``vec_id`` with :func:`as_vectors` for drop-in use;
* unit L2 norm (a zero-norm encoder output emits the all-zero vector,
  matching ``hashembed``'s empty-document convention);
* fixed-point-stable components: the normalized doubles are rounded to
  6 dp BEFORE the float32 cast, so ``similarity.quantize`` (x1e7 floor
  -> int64) sees identical integers no matter which engine or encoder
  produced the value — the determinism contract the whole vector
  family rests on;
* batch-shape independence: output depends only on each row's text,
  never on which Arrow batch or partition the row arrived in (the
  encoder callable must be row-wise deterministic; the seam enforces
  shape/finite-ness per batch and tests enforce partition invariance).

Scale shape: one projection-only scan of (id, text), no shuffle — the
encode stage is embarrassingly parallel and the Arrow batch size
(``spark.sql.execution.arrow.maxRecordsPerBatch``) bounds encoder peak
memory per task. At 100 TB the same seam runs the real model (GPU
executors / external inference service inside the encoder callable);
nothing downstream changes because the contract is enforced HERE.

No real model ships in this container, so :func:`stub_encoder` is the
deterministic stand-in: md5 token hashing computed in numpy on the
encoder side of the seam. Tests (``tests/test_encode.py``) prove the
seam itself: stub-through-mapInPandas equals the same numpy run
driver-side, is partition-invariant, rejects malformed encoders, and
composes with the ANN / k-means / near-dup chain.

ref: extension beyond the reference (no vector or inference surface in
the T-SQL warehouse); public pattern (Spark docs: mapInPandas for
model inference).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover - typing only
    import numpy as np
    import pandas as pd

# encoder: pandas Series of texts -> (len(texts), dim) array-like of floats
Encoder = Callable[["pd.Series"], "np.ndarray"]

ENCODED_SCHEMA = "doc_id bigint, embedding array<float>"


def encode_documents(
    docs: DataFrame,
    encoder: Encoder,
    dim: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    normalize: bool = True,
    round_dp: int = 6,
) -> DataFrame:
    """(doc_id, embedding array<float>): run ``encoder`` over the text
    column through Arrow-batched ``mapInPandas``, enforcing the embedding
    contract (see module note). The encoder sees one pandas Series per
    Arrow batch and must return a ``(len, dim)`` float array; shape or
    non-finite violations fail the task loudly rather than emitting
    corrupt vectors."""
    if dim <= 0:
        raise ValueError(f"dim must be positive, got {dim}")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            vecs = np.asarray(encoder(pdf[text_col]), dtype=np.float64)
            if vecs.shape != (len(pdf), dim):
                raise ValueError(
                    f"encoder returned shape {vecs.shape}, "
                    f"expected ({len(pdf)}, {dim})"
                )
            if not np.isfinite(vecs).all():
                raise ValueError("encoder returned non-finite components")
            if normalize:
                norms = np.sqrt((vecs * vecs).sum(axis=1, keepdims=True))
                vecs = np.divide(
                    vecs, norms, out=np.zeros_like(vecs), where=norms > 0.0
                )
            vecs = np.round(vecs, round_dp).astype(np.float32)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "embedding": list(vecs),
                }
            )

    narrow = docs.select(
        F.col(id_col).cast("bigint").alias("doc_id"), F.col(text_col).alias(text_col)
    )
    return narrow.mapInPandas(run, ENCODED_SCHEMA)


def as_vectors(encoded: DataFrame, label: int | None = None) -> DataFrame:
    """Rename the encoded frame to the ``embeddings``-table shape
    ``(vec_id, embedding, label)`` so it drops into every ANN / cluster /
    SemDeDup operator unchanged."""
    return encoded.select(
        F.col("doc_id").alias("vec_id"),
        "embedding",
        F.lit(label).cast("int").alias("label"),
    )


def stub_encoder(dim: int = 64) -> Encoder:
    """Deterministic stand-in for a real model: md5 hashing-trick token
    vectors computed in numpy on the encoder side of the seam. Row-wise
    (no cross-row state), so it exercises the batch-independence
    contract honestly."""

    def enc(texts: "pd.Series") -> "np.ndarray":
        import hashlib

        import numpy as np

        out = np.zeros((len(texts), dim), dtype=np.float64)
        for i, t in enumerate(texts):
            for tok in str(t).lower().split():
                h = int.from_bytes(
                    hashlib.md5(f"stub|{tok}".encode()).digest()[:8], "big"
                )
                out[i, h % dim] += 1.0 if (h >> 6) % 2 == 0 else -1.0
        return out

    return enc


def encode_reference(
    texts: list[str], encoder: Encoder, dim: int, round_dp: int = 6
) -> list[list[float]]:
    """Driver-side replay of the exact per-row math the seam performs —
    the parity oracle for tests: any encoder pushed through
    :func:`encode_documents` must reproduce this list bit-for-bit after
    the float32 cast."""
    import numpy as np
    import pandas as pd

    if not texts:
        return []
    vecs = np.asarray(encoder(pd.Series(texts)), dtype=np.float64)
    if vecs.shape != (len(texts), dim):
        raise ValueError(f"encoder returned shape {vecs.shape}")
    norms = np.sqrt((vecs * vecs).sum(axis=1, keepdims=True))
    vecs = np.divide(vecs, norms, out=np.zeros_like(vecs), where=norms > 0.0)
    vecs = np.round(vecs, round_dp).astype(np.float32)
    return [[float(x) for x in row] for row in vecs]
