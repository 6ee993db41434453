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
    """after-image JSON text -> canonical flat document JSON (string
    values), DELEGATING to oracle.extract_doc / oracle._coerce_str — the
    one implementation of the sync.go:198-245 extraction semantics,
    verified against the engine's map<string,string> rendering. A review
    pass found the previous inline re-implementation had drifted from
    the oracle in four ways (integral-float collapse, no string-`doc`
    unwrap, empty doc instead of a skip for scalar payloads, and
    non-compact ASCII-escaped nested rendering); one source of truth
    makes that class of drift impossible."""
    from .oracle import _coerce_str, extract_doc

    def one(s):
        if s is None:
            return None
        try:
            after = json.loads(s)
        except (ValueError, TypeError):
            return None
        if not isinstance(after, dict):
            return None
        doc = extract_doc(after)
        if doc is None:
            return None
        return json.dumps(
            {k: _coerce_str(v) for k, v in doc.items()},
            sort_keys=True, ensure_ascii=False,
        )

    return after_json.map(one)


@F.pandas_udf(T.StringType())
def sha256_udf(s: pd.Series) -> pd.Series:
    return s.map(
        lambda x: hashlib.sha256((x or "").encode("utf-8")).hexdigest()
        if x is not None
        else None
    )
