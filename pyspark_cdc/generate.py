"""Deterministic, seeded, scale-parameterized Debezium event-log generator.

Produces a Kafka-shaped parquet log (schemas.KAFKA_SHAPE) of envelopes over
the source-code-repository table (repo, path, commit, lang, content).

Two parts:

* ``edge_case_events()`` — ~40 handcrafted events covering every required
  edge case from FIXTURES.md F3 (soft-delete-via-update, revive, hard
  delete, tombstones, is_delete truthiness variants, string-encoded inner
  payload, numeric-token keys, unknown op, malformed JSON, duplicate
  replay, same-lsn tx tie-break, additive schema evolution, ...).
  Reference semantics cited per case.

* ``generate_log(spark, ...)`` — bulk generation, fully distributed: one
  ``spark.range`` plus native column expressions (xxhash64-derived
  pseudo-randomness), no Python in the data path, so the same call scales
  from 2k rows (pytest) to 10^8+ rows (bench) with identical semantics.
  Determinism: every value is a pure function of (row id, seed).

Zipf-ish hot-key skew: ``hot_pct`` percent of events hit a single hot repo
(north rule: salting + AQE must handle hot-repo skew).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schemas import KAFKA_SHAPE

# Two Debezium topics (multi-topic fan-in, SURVEY.md S3). Routing is a
# deterministic function of the record's repo — the analog of the
# reference's per-record index identity `{app_name}_{collection}`
# (sync.go:176-196): each repo belongs to exactly one route, so the
# route can be carried through the MERGE as a sink identity column.
TOPICS = ("cdc.public.repo_files", "cdc.public.repo_docs")
TOPIC = TOPICS[0]


def topic_for(repo) -> str:
    """Deterministic repo -> topic routing, identical in Python (edge
    cases + oracle checks), Spark (bulk generator), and DuckDB SQL:
    even len(repo) -> TOPICS[0], odd -> TOPICS[1]."""
    if repo is None:
        return TOPICS[0]
    return TOPICS[len(str(repo)) % 2]


# lsn space: edge cases use 1..999; bulk starts at BULK_LSN_BASE.
BULK_LSN_BASE = 1_000


def _env(op, after=None, before=None, lsn=None, tx=None, ts=None):
    payload = {"op": op, "source": {"lsn": lsn, "ts_ms": ts if ts is not None else lsn}}
    if tx is not None:
        payload["transaction"] = {"id": tx}
    if before is not None:
        payload["before"] = before
    if after is not None:
        payload["after"] = after
    return json.dumps({"payload": payload})


def _rec(value, key=None, lsn=0, partition=0):
    repo = None
    if key:
        try:
            repo = json.loads(key).get("repo")
        except (ValueError, TypeError):
            repo = None
    return {
        "key": key,
        "value": value,
        "topic": topic_for(repo),
        "partition": partition,
        "offset": int(lsn),
    }


def _after(repo, path, v, **extra):
    """Deterministic row image for key (repo, path) at version tag v."""
    d = {
        "repo": repo,
        "path": path,
        "commit": f"{v:040d}"[-40:],
        "lang": "py",
        "content": f"content of {repo}/{path} v{v}",
    }
    d.update(extra)
    return d


def edge_case_events() -> list[dict]:
    """FIXTURES.md F3 cases 1-16 (minus bulk-only skew), in Kafka shape.

    File order intentionally differs from lsn order where a case requires
    out-of-order arrival.
    """
    ev: list[dict] = []

    def add(value, key=None, lsn=0):
        ev.append(_rec(value, key=key, lsn=lsn))

    def k(repo, path):
        return json.dumps({"repo": repo, "path": path})

    # 1. insert -> update -> update (LWW picks highest lsn)  [sync.go:84]
    add(_env("c", _after("edge/r1", "a.py", 1), lsn=1), k("edge/r1", "a.py"), 1)
    add(_env("u", _after("edge/r1", "a.py", 2), lsn=2), k("edge/r1", "a.py"), 2)
    add(_env("u", _after("edge/r1", "a.py", 3), lsn=3), k("edge/r1", "a.py"), 3)

    # 2. soft delete via update: op=u + after.is_delete=true (bool)
    #    => physical delete  [sync.go:69-76]
    add(_env("c", _after("edge/r2", "b.py", 4), lsn=4), k("edge/r2", "b.py"), 4)
    add(
        _env("u", _after("edge/r2", "b.py", 5, is_delete=True), lsn=5),
        k("edge/r2", "b.py"),
        5,
    )

    # 3. revive: upsert after soft delete re-inserts  [document_repository.py:42]
    add(_env("c", _after("edge/r3", "c.py", 6), lsn=6), k("edge/r3", "c.py"), 6)
    add(
        _env("u", _after("edge/r3", "c.py", 7, is_delete=True), lsn=7),
        k("edge/r3", "c.py"),
        7,
    )
    add(
        _env("u", _after("edge/r3", "c.py", 8, is_delete=False), lsn=8),
        k("edge/r3", "c.py"),
        8,
    )

    # 4. hard delete op=d, after=null, key from before  [sync.go:146-156]
    add(_env("c", _after("edge/r4", "d.py", 9), lsn=9), k("edge/r4", "d.py"), 9)
    add(
        _env("d", before={"repo": "edge/r4", "path": "d.py"}, lsn=10),
        k("edge/r4", "d.py"),
        10,
    )

    # 5. delete of never-inserted key: no-op  [DeleteDocument on missing id]
    add(
        _env("d", before={"repo": "edge/r5", "path": "ghost.py"}, lsn=11),
        k("edge/r5", "ghost.py"),
        11,
    )

    # 7. out-of-order within batch: lsn 13 (final) arrives before lsn 12
    add(_env("u", _after("edge/r6", "f.py", 13), lsn=13), k("edge/r6", "f.py"), 13)
    add(_env("c", _after("edge/r6", "f.py", 12), lsn=12), k("edge/r6", "f.py"), 12)

    # 9. is_delete truthiness variants  [sync.go:162-174]
    add(_env("c", _after("edge/r7", "g.py", 14), lsn=14), k("edge/r7", "g.py"), 14)
    add(
        _env("u", _after("edge/r7", "g.py", 15, is_delete="true"), lsn=15),
        k("edge/r7", "g.py"),
        15,
    )
    add(_env("c", _after("edge/r8", "h.py", 16), lsn=16), k("edge/r8", "h.py"), 16)
    add(
        _env("u", _after("edge/r8", "h.py", 17, is_delete="1"), lsn=17),
        k("edge/r8", "h.py"),
        17,
    )
    # falsy variants must NOT delete
    add(
        _env("c", _after("edge/r9", "i.py", 18, is_delete=False), lsn=18),
        k("edge/r9", "i.py"),
        18,
    )
    add(
        _env("u", _after("edge/r9", "i.py", 19, is_delete="0"), lsn=19),
        k("edge/r9", "i.py"),
        19,
    )

    # 10. snapshot op r behaves as create  [sync.go:52,137]
    add(_env("r", _after("edge/r10", "j.py", 20), lsn=20), k("edge/r10", "j.py"), 20)

    # 11. unknown op: skipped + counted, never fails  [sync.go:157-158]
    add(_env("x", _after("edge/r1", "a.py", 21), lsn=21), k("edge/r1", "a.py"), 21)

    # 12. malformed JSON value: skipped + counted  [sync.go:130-132]
    ev.append(_rec('{"payload": {broken', key=None, lsn=0))

    # 8. tombstone records: empty / literal "null"  [sync.go:124-127]
    ev.append(_rec("", key=k("edge/r1", "a.py"), lsn=0))
    ev.append(_rec("null", key=k("edge/r1", "a.py"), lsn=0))

    # 13. string-encoded inner payload to unwrap  [sync.go:207-217]
    inner = json.dumps(
        {"commit": f"{22:040d}", "lang": "go", "content": "content of edge/r11/k.go v22"}
    )
    add(
        _env(
            "c",
            {"repo": "edge/r11", "path": "k.go", "payload": inner},
            lsn=22,
        ),
        k("edge/r11", "k.go"),
        22,
    )

    # 14. numeric JSON tokens coerced to string keys  [sync.go:227-231 fmt.Sprint]
    add(
        _env(
            "c",
            {"repo": 123, "path": 456, "commit": "deadbeef", "lang": "md",
             "content": "numeric-key row v23"},
            lsn=23,
        ),
        json.dumps({"repo": 123, "path": 456}),
        23,
    )

    # 15. additive schema evolution: new column `branch` appears  [north rule]
    add(
        _env("c", _after("edge/r13", "m.py", 24, branch="release/1"), lsn=24),
        k("edge/r13", "m.py"),
        24,
    )

    # update for a key never created: upsert inserts (Meili AddDocuments
    # semantics, sync.go:84)
    add(_env("u", _after("edge/r14", "n.py", 25), lsn=25), k("edge/r14", "n.py"), 25)

    # same-lsn tx tie-break: transaction.id decides  [SURVEY.md J1]
    add(
        _env("u", _after("edge/r15", "o.py", 261), lsn=26, tx=1),
        k("edge/r15", "o.py"),
        26,
    )
    add(
        _env("u", _after("edge/r15", "o.py", 262), lsn=26, tx=2),
        k("edge/r15", "o.py"),
        26,
    )

    # after with missing repo/path: missing-key dead letter  [sync.go:142-145]
    add(_env("c", {"commit": "beef", "content": "orphan"}, lsn=27), None, 27)

    # 17. doc sub-map fallback (sync.go:219-220): no payload key, the
    # `doc` object IS the document; keys fall back to the flat image
    add(
        _env(
            "c",
            {
                "repo": "edge/r16",
                "path": "p.rs",
                "doc": {
                    "commit": f"{28:040d}",
                    "lang": "rs",
                    "content": "content of edge/r16/p.rs v28",
                },
            },
            lsn=28,
        ),
        k("edge/r16", "p.rs"),
        28,
    )

    # 18. unparseable string payload => the RECORD is skipped
    # (sync.go:208-210): the earlier good version must survive the
    # higher-lsn bad event
    add(_env("c", _after("edge/r17", "q.py", 29), lsn=29), k("edge/r17", "q.py"), 29)
    add(
        _env(
            "u",
            {"repo": "edge/r17", "path": "q.py", "payload": "{not json"},
            lsn=30,
        ),
        k("edge/r17", "q.py"),
        30,
    )

    # 19. payload REPLACES the flat image (sync.go:204-217): flat content
    # and flat extras must NOT leak into the unwrapped doc
    add(
        _env(
            "u",
            {
                "repo": "edge/r18",
                "path": "r.go",
                "content": "flat-should-drop",
                "flat_extra": "should-drop",
                "payload": json.dumps(
                    {
                        "commit": f"{31:040d}",
                        "lang": "go",
                        "content": "content of edge/r18/r.go v31",
                    }
                ),
            },
            lsn=31,
        ),
        k("edge/r18", "r.go"),
        31,
    )

    # 20. payload as an inline JSON object, not a string (sync.go:213)
    add(
        _env(
            "c",
            {
                "repo": "edge/r19",
                "path": "s.ts",
                "payload": {
                    "commit": f"{32:040d}",
                    "lang": "ts",
                    "content": "content of edge/r19/s.ts v32",
                },
            },
            lsn=32,
        ),
        k("edge/r19", "s.ts"),
        32,
    )

    # 21. flat is_delete overrides the inner one (sync.go:237-239): inner
    # says delete, flat says "0" => the upsert stands
    add(
        _env(
            "u",
            {
                "repo": "edge/r20",
                "path": "t.py",
                "is_delete": "0",
                "payload": json.dumps(
                    {
                        "commit": f"{33:040d}",
                        "lang": "py",
                        "content": "content of edge/r20/t.py v33",
                        "is_delete": "true",
                    }
                ),
            },
            lsn=33,
        ),
        k("edge/r20", "t.py"),
        33,
    )

    # 22. inner-only is_delete still soft-deletes (base has no is_delete,
    # doc's own value decides — sync.go:162-174 over the unwrapped doc)
    add(_env("c", _after("edge/r21", "u.py", 34), lsn=34), k("edge/r21", "u.py"), 34)
    add(
        _env(
            "u",
            {
                "repo": "edge/r21",
                "path": "u.py",
                "payload": json.dumps({"is_delete": "1"}),
            },
            lsn=35,
        ),
        k("edge/r21", "u.py"),
        35,
    )

    # 23. flat is_delete present-but-JSON-NULL next to an inner "true":
    # the reference copies the flat nil value last (sync.go:237-239),
    # which is non-truthy => the upsert STANDS. The null must OVERRIDE
    # the inner value, not fall through to it.
    add(
        _env(
            "u",
            {
                "repo": "edge/r22",
                "path": "v.py",
                "is_delete": None,
                "payload": json.dumps(
                    {
                        "commit": f"{36:040d}",
                        "lang": "py",
                        "content": "content of edge/r22/v.py v36",
                        "is_delete": "true",
                    }
                ),
            },
            lsn=36,
        ),
        k("edge/r22", "v.py"),
        36,
    )

    # 6. duplicate replay: lsn 1-3 repeated verbatim (at-least-once)
    ev.append(_rec(_env("c", _after("edge/r1", "a.py", 1), lsn=1), k("edge/r1", "a.py"), 1))
    ev.append(_rec(_env("u", _after("edge/r1", "a.py", 2), lsn=2), k("edge/r1", "a.py"), 2))
    ev.append(_rec(_env("u", _after("edge/r1", "a.py", 3), lsn=3), k("edge/r1", "a.py"), 3))

    return ev


def edge_case_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(edge_case_events(), schema=KAFKA_SHAPE)


# ---------------------------------------------------------------------------
# Bulk distributed generation
# ---------------------------------------------------------------------------


def bulk_events_df(
    spark: SparkSession,
    n_events: int,
    n_keys: int = 1_000,
    seed: int = 42,
    hot_pct: int = 30,
    hot_repo: str = "org0/hot-repo",
    n_repos: int = 50,
    n_partitions: int = 8,
    content_repeats: int = 8,
    content_words: int = 1,
    evolve_after_frac: float = 0.6,
) -> DataFrame:
    """Distributed event synthesis: pure column expressions over spark.range.

    Event mix (per mille of rows, via deterministic hash buckets):
      20 hard deletes (op=d) / 30 soft deletes via op=u + is_delete variants
      / 3 unknown op / 3 malformed JSON / 3 tombstones / 40 string-encoded
      inner payload / 50 snapshot op=r / remainder c/u upserts.
    ``hot_pct``% of events target paths inside one hot repo (skew).
    From ``evolve_after_frac * n_events`` onward, upserts carry an extra
    ``branch`` column (additive schema evolution mid-log).
    """
    df = spark.range(0, n_events, 1, numPartitions=max(32, n_partitions))
    i = F.col("id")
    lsn = i + F.lit(BULK_LSN_BASE)

    h = lambda salt: F.abs(F.xxhash64(i, F.lit(seed), F.lit(salt)))  # noqa: E731

    # --- key selection (Zipf-ish: one hot repo owns hot_pct% of events) ---
    is_hot = (h("hot") % 100) < F.lit(hot_pct)
    n_hot_paths = max(1, n_keys // 20)
    key_id = F.when(is_hot, h("hk") % F.lit(n_hot_paths)).otherwise(
        h("ck") % F.lit(n_keys)
    )
    repo = F.when(is_hot, F.lit(hot_repo)).otherwise(
        F.concat(F.lit("org"), (key_id % F.lit(n_repos)).cast("string"), F.lit("/proj"))
    )
    path = F.concat(
        F.lit("src/pkg"),
        (key_id % 37).cast("string"),
        F.lit("/file"),
        key_id.cast("string"),
        F.when(is_hot, F.lit("_hot")).otherwise(F.lit("")),
        F.lit(".py"),
    )

    # --- op mix ---
    r = h("op") % 1000
    kind = (
        F.when(r < 20, F.lit("hard_delete"))
        .when(r < 50, F.lit("soft_delete"))
        .when(r < 53, F.lit("unknown"))
        .when(r < 56, F.lit("malformed"))
        .when(r < 59, F.lit("tombstone"))
        .when(r < 99, F.lit("wrapped"))
        .when(r < 149, F.lit("snapshot"))
        .otherwise(F.lit("upsert"))
    )

    md = F.md5(F.concat(repo, path, lsn.cast("string")))
    commit = F.concat(md, F.substring(F.md5(F.concat(lsn.cast("string"), repo)), 1, 8))
    lang = F.element_at(
        F.array(F.lit("py"), F.lit("go"), F.lit("ts"), F.lit("md"), F.lit("sql")),
        (key_id % 5 + 1).cast("int"),
    )
    content = F.concat(
        F.lit("file "), path, F.lit(" of "), repo,
        F.lit(" v"), lsn.cast("string"), F.lit(" "),
        F.repeat(md, content_repeats),
    )
    if content_words > 1:
        # document-shaped content for dedup/shingling benchmarks: append
        # content_words extra whitespace-separated deterministic tokens,
        # distinct per position so the shingle set is realistic (default
        # 1 keeps the historical single-blob shape byte-exact)
        content = F.concat(
            content,
            F.lit(" "),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), F.lit(content_words)),
                    lambda i: F.concat(
                        F.lit("w"), F.substring(md, 1, 4), i.cast("string")
                    ),
                ),
            ),
        )

    evolve = i >= F.lit(int(n_events * evolve_after_frac))
    branch = F.when(
        evolve, F.concat(F.lit("release/"), (h("br") % 5).cast("string"))
    )  # null before the evolution point => key absent from JSON

    is_delete_variant = F.element_at(
        F.array(F.lit("true"), F.lit("1")), (h("dv") % 2 + 1).cast("int")
    )

    after_flat = F.struct(
        repo.alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
        F.when(kind == "soft_delete", is_delete_variant).alias("is_delete"),
        branch.alias("branch"),
    )
    inner_payload = F.to_json(
        F.struct(commit.alias("commit"), lang.alias("lang"), content.alias("content"))
    )
    after_wrapped = F.struct(
        repo.alias("repo"),
        path.alias("path"),
        inner_payload.alias("payload"),
        branch.alias("branch"),
    )
    before_key = F.struct(repo.alias("repo"), path.alias("path"))

    src = F.struct(lsn.alias("lsn"), lsn.alias("ts_ms"))
    tx = F.struct(lsn.alias("id"))

    op = (
        F.when(kind == "hard_delete", F.lit("d"))
        .when(kind == "unknown", F.lit("x"))
        .when(kind == "snapshot", F.lit("r"))
        .when(i % 7 == 0, F.lit("c"))
        .otherwise(F.lit("u"))
    )

    value = (
        F.when(kind == "tombstone", F.when(h("tb") % 2 == 0, F.lit("")).otherwise(F.lit("null")))
        .when(kind == "malformed", F.lit('{"payload": {broken'))
        .when(
            kind == "hard_delete",
            F.to_json(
                F.struct(
                    F.struct(
                        before_key.alias("before"),
                        op.alias("op"),
                        src.alias("source"),
                        tx.alias("transaction"),
                    ).alias("payload")
                )
            ),
        )
        .when(
            kind == "wrapped",
            F.to_json(
                F.struct(
                    F.struct(
                        after_wrapped.alias("after"),
                        op.alias("op"),
                        src.alias("source"),
                        tx.alias("transaction"),
                    ).alias("payload")
                )
            ),
        )
        .otherwise(
            F.to_json(
                F.struct(
                    F.struct(
                        after_flat.alias("after"),
                        op.alias("op"),
                        src.alias("source"),
                        tx.alias("transaction"),
                    ).alias("payload")
                )
            )
        )
    )

    key = F.to_json(F.struct(repo.alias("repo"), path.alias("path")))
    partition = (F.abs(F.xxhash64(repo, path)) % F.lit(n_partitions)).cast("int")
    # topic_for(repo) as a native expression (multi-topic fan-in, S3)
    topic = F.when(F.length(repo) % 2 == 0, F.lit(TOPICS[0])).otherwise(
        F.lit(TOPICS[1])
    )

    return df.select(
        key.alias("key"),
        value.alias("value"),
        topic.alias("topic"),
        partition.alias("partition"),
        lsn.alias("offset"),
    )


def write_log(
    spark: SparkSession,
    out_dir: str,
    n_events: int,
    n_files: int = 8,
    include_edge_cases: bool = True,
    **bulk_kwargs,
) -> str:
    """Write the full event log (edge cases + bulk) as parquet files.

    n_files controls streaming granularity (maxFilesPerTrigger=1 => one
    micro-batch per file).
    """
    bulk = bulk_events_df(spark, n_events, **bulk_kwargs)
    if include_edge_cases:
        log = edge_case_df(spark).unionByName(bulk)
    else:
        log = bulk
    log.repartition(n_files).write.mode("overwrite").parquet(out_dir)
    return out_dir
