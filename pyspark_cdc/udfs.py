"""Vectorized Arrow/pandas UDFs (the mandated slow-path escape hatch —
input_hint: "vectorized pandas/Arrow UDFs (no per-row Python)").

The hot path in parse.py is pure native SQL expressions; these UDFs cover
the genuinely dynamic/Python-shaped work and serve as cross-checks:

* extract_doc_json — the open-world document extraction of
  sync.go:198-224 (unwrap string-encoded inner payload, inner overrides
  flat) done with real json.loads over an Arrow batch; parity-tested
  against the native from_json path.
* sha256_udf — per-row content fingerprint for the correctness invariant;
  parity-tested against native F.sha2(col, 256).

Both are pandas_udf (Arrow batch transfer), never row-at-a-time Python;
tests assert no BatchEvalPython node ever appears in an engine plan.
"""

from __future__ import annotations

import hashlib
import json

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.StringType())
def extract_doc_json(after_json: pd.Series) -> pd.Series:
    """after-image JSON text -> canonical flat document JSON (string values),
    mirroring oracle.extract_doc / sync.go:198-224."""

    def one(s):
        if s is None:
            return None
        try:
            after = json.loads(s)
        except (ValueError, TypeError):
            return None
        if not isinstance(after, dict):
            return None
        # sync.go:198-245: a present payload REPLACES the flat image
        # (string must parse to an object, else the record is skipped =>
        # None); else a doc sub-map unwraps; else doc = after. Key fields
        # fall back to the flat image; flat is_delete overrides inner.
        if "payload" in after:
            p = after["payload"]
            if isinstance(p, str):
                try:
                    q = json.loads(p)
                except (ValueError, TypeError):
                    return None
                if not isinstance(q, dict):
                    return None
                doc = dict(q)
            elif isinstance(p, dict):
                doc = dict(p)
            else:
                doc = {}
        elif isinstance(after.get("doc"), dict):
            doc = dict(after["doc"])
        else:
            doc = dict(after)
        for kf in ("repo", "path"):
            if doc.get(kf) is None and after.get(kf) is not None:
                doc[kf] = after[kf]
        if "is_delete" in after:
            doc["is_delete"] = after["is_delete"]

        def coerce(v):
            if v is None:
                return None
            if isinstance(v, bool):
                return "true" if v else "false"
            if isinstance(v, float) and v.is_integer():
                return str(int(v))
            if isinstance(v, (dict, list)):
                return json.dumps(v)
            return str(v)

        return json.dumps({k: coerce(v) for k, v in doc.items()}, sort_keys=True)

    return after_json.map(one)


@F.pandas_udf(T.StringType())
def sha256_udf(s: pd.Series) -> pd.Series:
    return s.map(
        lambda x: hashlib.sha256((x or "").encode("utf-8")).hexdigest()
        if x is not None
        else None
    )
