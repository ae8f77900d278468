"""Embedding column production (SURVEY §2.1 M9) — Arrow-batched pandas UDF.

The reference attaches SentenceTransformer vectors per node
(``embedding_processor.py:118-190``, batch 32, 1536-d).  No embedding model
ships in this container, so the encoder is STUBBED (clearly marked): a
deterministic hash-derived unit vector stands in for the model while the
Spark-side plumbing — batched Arrow transfer, ``array<float>`` schema,
normalization — is real.  Swap ``_fake_encode`` for a real
model-in-executor call (lazy module-level singleton, exactly like the
reference's lazy model property ``hybrid_processor.py:88-98``).
"""

import hashlib
import math

import pandas as pd  # real import: pandas_udf resolves the signature hints

from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, FloatType

EMBED_DIM = 64


def _fake_encode(text: str, dim: int = EMBED_DIM) -> "list[float]":
    """STUB encoder — deterministic, hash-derived, L2-normalized.

    NOT a semantic embedding; replace with a real model call in production.
    """
    out: list[float] = []
    i = 0
    while len(out) < dim:
        digest = hashlib.sha256(f"{i}\x00{text}".encode()).digest()
        out.extend(b / 255.0 - 0.5 for b in digest)
        i += 1
    out = out[:dim]
    norm = math.sqrt(sum(v * v for v in out)) or 1.0
    return [v / norm for v in out]


@pandas_udf(ArrayType(FloatType()))
def embed_text(texts: pd.Series) -> pd.Series:
    """Vectorized (Arrow-batched) embedding column; see module docstring."""
    return texts.map(lambda t: _fake_encode(t if isinstance(t, str) else ""))


def embed_expr(col) -> Column:
    from pyspark.sql import functions as F

    return embed_text(F.col(col) if isinstance(col, str) else col)
