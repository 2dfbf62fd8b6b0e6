"""Password predicate support (reference: types/password.go — bcrypt
hash/verify; checkpwd function worker/task.go:581-584).

bcrypt is not guaranteed in this container: we use bcrypt when
importable, else a salted-sha256 scheme with the same API (documented
divergence — the *function surface* matches, the hash format is ours).
"""

from __future__ import annotations

import hashlib
import os

try:  # pragma: no cover - environment dependent
    import bcrypt  # type: ignore

    _HAS_BCRYPT = True
except Exception:  # pragma: no cover
    _HAS_BCRYPT = False

import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf


def hash_password(plain: str) -> str:
    if _HAS_BCRYPT:
        return bcrypt.hashpw(plain.encode(), bcrypt.gensalt()).decode()
    salt = os.urandom(8).hex()
    digest = hashlib.sha256((salt + plain).encode()).hexdigest()
    return f"sha256${salt}${digest}"


def verify_password(plain: str, hashed: str) -> bool:
    if hashed.startswith("sha256$"):
        _, salt, digest = hashed.split("$", 2)
        return hashlib.sha256((salt + plain).encode()).hexdigest() == digest
    if _HAS_BCRYPT and hashed.startswith("$2"):
        try:
            return bcrypt.checkpw(plain.encode(), hashed.encode())
        except ValueError:
            return False
    # value loaded verbatim (e.g. RDF import of a plaintext fixture):
    # compare directly — dgraph hashes at mutation time; imported raw
    # strings can only match by equality
    return hashed == plain


def checkpwd(col: Column, candidate: str) -> Column:
    """checkpwd(pred, "secret") filter column (Arrow-batched UDF — the
    bcrypt verify is inherently CPU-bound Python/C)."""

    @pandas_udf("boolean")
    def _check(vals: pd.Series) -> pd.Series:
        return pd.Series([bool(v) and verify_password(candidate, v) for v in vals])

    return _check(col)
