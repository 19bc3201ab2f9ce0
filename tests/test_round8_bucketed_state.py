"""Round-8 tests for the streaming dedup gates' BUCKETED state store
(streaming/dedup.compact_near_dedup_state(bucket=True)): epoch-table
probe equivalence end-to-end through both gates, the zero-store-side-
exchange plan property, append-only epoch accrual, manifest crash
recovery in both directions, and the checkpoint-reset refusal guard."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from rdsa_utils_spark.streaming.dedup import (
    _read_state_parts,
    compact_near_dedup_state,
    recover_near_dedup_state,
    write_stream_exact_dedup,
    write_stream_near_dedup,
)

SCHEMA = "id long, text string"


def _text(words):
    return " ".join(words)


BASE = [f"w{i}" for i in range(40)]
OTHER = [f"x{i}" for i in range(40)]
THIRD = [f"y{i}" for i in range(40)]

DOC_A = _text(BASE)                    # id 1 — admitted batch 0
DOC_C = _text(OTHER)                   # id 3 — admitted batch 0
DOC_E = _text(THIRD)                   # id 5 — admitted batch 1
DOC_H = _text([f"z{i}" for i in range(40)])   # id 8 — admitted batch 2
DOC_D = _text(BASE[:-1] + ["qq"])      # id 4 — near-dup of A (epoch 1)
DOC_I = _text(THIRD[:-1] + ["rr"])     # id 9 — near-dup of E (epoch 1)
DOC_J = _text([f"v{i}" for i in range(40)])   # id 10 — new distinct


def _run_near(spark, src, path, state, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = write_stream_near_dedup(
        stream, "text", "id", path, state, ckpt, jaccard_threshold=0.8,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def _append(spark, src, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append",
    ).parquet(src)


def test_near_gate_probes_bucketed_epochs(spark, tmp_path):
    src = str(tmp_path / "feed")
    path = str(tmp_path / "out")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    try:
        _append(spark, src, [(1, DOC_A), (3, DOC_C)])
        _run_near(spark, src, path, state, ckpt)
        _append(spark, src, [(5, DOC_E)])
        _run_near(spark, src, path, state, ckpt)
        _append(spark, src, [(8, DOC_H)])
        _run_near(spark, src, path, state, ckpt)

        # batches 0,1 fold into epoch e1; dir 2 (newest) stays put
        reclaimed = compact_near_dedup_state(spark, state, bucket=True,
                                             num_buckets=4)
        assert reclaimed == 2 * 2  # batches 0,1 × (bands, sigs)
        assert sorted(os.listdir(f"{state}/bands")) == ["__batch__=2"]
        man = json.loads(open(f"{state}/bands__manifest__").read())
        assert man["label"] == 1 and len(man["epochs"]) == 1
        assert man["epochs"][0]["bucket_cols"] == ["band", "band_hash"]

        # cross-batch near-dups of epoch-resident docs are still caught
        _append(spark, src, [(4, DOC_D), (9, DOC_I), (10, DOC_J)])
        _run_near(spark, src, path, state, ckpt)
        got = {r["id"] for r in spark.read.parquet(path).collect()}
        assert got == {1, 3, 5, 8, 10}

        # append-only second compaction: e1 untouched, new epoch added
        reclaimed = compact_near_dedup_state(spark, state, bucket=True,
                                             num_buckets=4)
        assert reclaimed == 2 * 1  # batch 2 only (3 is newest)
        man2 = json.loads(open(f"{state}/bands__manifest__").read())
        assert [e["table"] for e in man2["epochs"]][0] == \
            man["epochs"][0]["table"]
        assert len(man2["epochs"]) == 2 and man2["label"] == 2

        # gate still agrees with the one-shot batch dedup on the union
        _append(spark, src, [(11, _text(BASE[:-1] + ["uu"]))])  # dup of A
        _run_near(spark, src, path, state, ckpt)
        got = {r["id"] for r in spark.read.parquet(path).collect()}
        assert got == {1, 3, 5, 8, 10}
        from rdsa_utils_spark.operators.dedup import minhash_near_dedup

        union = spark.read.parquet(src)
        batch_kept = {
            r["id"]
            for r in minhash_near_dedup(
                union, "text", "id", jaccard_threshold=0.8,
            ).collect()
        }
        assert batch_kept == got
    finally:
        for kind in ("bands", "sigs"):
            mp = f"{state}/{kind}__manifest__"
            if os.path.exists(mp):
                for e in json.loads(open(mp).read())["epochs"]:
                    spark.sql(f"DROP TABLE IF EXISTS {e['table']}")


def test_exact_gate_probes_bucketed_epochs(spark, tmp_path):
    src = str(tmp_path / "feed")
    path = str(tmp_path / "out")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        q = write_stream_exact_dedup(
            stream, "text", "id", path, state, ckpt,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    try:
        _append(spark, src, [(1, "alpha beta"), (2, "gamma delta")])
        run()
        _append(spark, src, [(3, "epsilon zeta")])
        run()
        _append(spark, src, [(4, "eta theta")])
        run()
        assert compact_near_dedup_state(
            spark, state, kinds=("fps",), bucket=True, num_buckets=4,
        ) == 2
        # duplicates of epoch-resident docs still dropped
        _append(spark, src, [(5, "ALPHA   beta"), (6, "iota kappa")])
        run()
        got = {r["id"] for r in spark.read.parquet(path).collect()}
        assert got == {1, 2, 3, 4, 6}
    finally:
        mp = f"{state}/fps__manifest__"
        if os.path.exists(mp):
            for e in json.loads(open(mp).read())["epochs"]:
                spark.sql(f"DROP TABLE IF EXISTS {e['table']}")


def _write_state(spark, state, kind, batches):
    for bid, rows in batches.items():
        if kind == "bands":
            df = spark.createDataFrame(
                rows, "id long, band int, band_hash long",
            )
        else:
            df = spark.createDataFrame(rows, "id long, minhash array<long>")
        df.write.mode("overwrite").parquet(f"{state}/{kind}/__batch__={bid}")


def test_bucketed_probe_has_zero_store_side_exchanges(spark, tmp_path):
    """THE scale property this store exists for: the per-micro-batch
    probe equi-join against a compacted epoch plans with no Exchange
    on the store side — only the (batch-sized) probe shuffles. The
    assertion runs on the GATE'S OWN probe construction
    (streaming/dedup._band_hit_parts), not a reconstructed join."""
    from rdsa_utils_spark.plans.explain import count_exchanges, plan_string
    from rdsa_utils_spark.streaming.dedup import _band_hit_parts

    state = str(tmp_path / "state")
    _write_state(spark, state, "bands", {
        0: [(1, b, 100 + b) for b in range(4)],
        1: [(2, b, 200 + b) for b in range(4)],
        2: [(3, b, 300 + b) for b in range(4)],
    })
    compact_near_dedup_state(
        spark, state, kinds=("bands",), bucket=True, num_buckets=4,
    )
    man = json.loads(open(f"{state}/bands__manifest__").read())
    try:
        spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        parts = _read_state_parts(spark, state, "bands", before_batch=99)
        assert len(parts) == 2  # epoch table + uncompacted dir tail
        batch_bands = spark.createDataFrame(
            [(10, 0, 100), (11, 1, 201)], "id long, band int, band_hash long",
        )
        hit_parts = _band_hit_parts(parts, batch_bands, "id", 0.01)
        epoch_hits = hit_parts[0]
        plan = plan_string(epoch_hits)
        assert "bands__epoch__" in plan          # scanning the epoch table
        assert "Bucketed: true" in plan, plan    # as a bucketed scan
        # the only shuffle is the (batch-sized) probe side; the Bloom
        # bitmap arrives as a BroadcastExchange, which moves one row
        assert count_exchanges(epoch_hits) == 1, plan
        assert epoch_hits.count() == 2
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        for e in man["epochs"]:
            spark.sql(f"DROP TABLE IF EXISTS {e['table']}")


def test_bucketed_fps_distinct_has_zero_exchanges(spark, tmp_path):
    """The exact gate's per-epoch distinct() must also run
    exchange-free: a fingerprint-bucketed scan already satisfies the
    aggregate's required distribution."""
    from rdsa_utils_spark.plans.explain import count_exchanges, plan_string

    state = str(tmp_path / "state")
    for bid in range(3):
        spark.createDataFrame(
            [(f"fp{bid}{i}",) for i in range(5)], "fingerprint string",
        ).write.mode("overwrite").parquet(f"{state}/fps/__batch__={bid}")
    compact_near_dedup_state(
        spark, state, kinds=("fps",), bucket=True, num_buckets=4,
    )
    man = json.loads(open(f"{state}/fps__manifest__").read())
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        parts = _read_state_parts(spark, state, "fps", before_batch=99)
        epoch = parts[0]
        dd = epoch.distinct()
        assert count_exchanges(dd) == 0, plan_string(dd)
        assert dd.count() == 10  # batches 0,1 merged
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        for e in man["epochs"]:
            spark.sql(f"DROP TABLE IF EXISTS {e['table']}")


def test_rebuild_merges_epochs_to_one(spark, tmp_path):
    from rdsa_utils_spark.plans.explain import count_exchanges
    from rdsa_utils_spark.streaming.dedup import rebuild_near_dedup_epochs

    state = str(tmp_path / "state")
    _write_state(spark, state, "bands", {
        0: [(1, 0, 1)], 1: [(2, 0, 2)], 2: [(3, 0, 3)],
    })
    compact_near_dedup_state(
        spark, state, kinds=("bands",), bucket=True, num_buckets=2,
    )
    _write_state(spark, state, "bands", {3: [(4, 0, 4)], 4: [(5, 0, 5)]})
    compact_near_dedup_state(
        spark, state, kinds=("bands",), bucket=True, num_buckets=2,
    )
    man2 = json.loads(open(f"{state}/bands__manifest__").read())
    assert len(man2["epochs"]) == 2
    try:
        # rescale bucket count during the rebuild — the growth knob
        retired = rebuild_near_dedup_epochs(
            spark, state, kinds=("bands",), num_buckets=4,
        )
        assert retired == 2
        man3 = json.loads(open(f"{state}/bands__manifest__").read())
        assert len(man3["epochs"]) == 1
        assert man3["label"] == man2["label"]
        assert man3["epochs"][0]["num_buckets"] == 4
        # probe view unchanged: batches 0..3 merged, 4 still a dir
        parts = _read_state_parts(spark, state, "bands", before_batch=99)
        rows = sorted(tuple(r) for p in parts for r in p.collect())
        assert rows == [(i, 0, i) for i in range(1, 6)]
        # zero-exchange property survives the rebuild
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        probe = spark.createDataFrame(
            [(9, 0, 3)], "id long, band int, band_hash long",
        ).withColumnRenamed("id", "new_id")
        hit = parts[0].withColumnRenamed("id", "old_id").join(
            probe, ["band", "band_hash"],
        )
        assert count_exchanges(hit) == 1
        # old epoch tables dropped from the catalog
        for e in man2["epochs"]:
            assert not spark.catalog.tableExists(e["table"])
        # idempotent: single epoch left, nothing to rebuild
        assert rebuild_near_dedup_epochs(
            spark, state, kinds=("bands",),
        ) == 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        mp = f"{state}/bands__manifest__"
        if os.path.exists(mp):
            for e in json.loads(open(mp).read())["epochs"]:
                spark.sql(f"DROP TABLE IF EXISTS {e['table']}")


def test_compaction_sweeps_crashed_rebuild_table(spark, tmp_path):
    """A rebuild that crashed pre-manifest leaves an r-prefixed epoch
    table; the next compaction's orphan sweep must drop the CATALOG
    entry too, not just its backing folder (a dangling external table
    — review finding)."""
    from rdsa_utils_spark.streaming.dedup import _default_table_prefix
    from rdsa_utils_spark.sources.writers import write_bucketed_table

    state = str(tmp_path / "state")
    _write_state(spark, state, "bands", {
        0: [(1, 0, 1)], 1: [(2, 0, 2)], 2: [(3, 0, 3)],
    })
    prefix = _default_table_prefix(state)
    orphan = f"{prefix}_bands_r9"
    write_bucketed_table(
        spark.createDataFrame(
            [(9, 0, 9, 9)], "id long, band int, band_hash long, __batch__ int",
        ),
        orphan, ["band", "band_hash"], 2,
        path=f"{state}/bands__epoch__r9",
    )
    man = None
    try:
        compact_near_dedup_state(
            spark, state, kinds=("bands",), bucket=True, num_buckets=2,
        )
        man = json.loads(open(f"{state}/bands__manifest__").read())
        assert not spark.catalog.tableExists(orphan)
        assert not os.path.exists(f"{state}/bands__epoch__r9")
        # the real store is intact
        parts = _read_state_parts(spark, state, "bands", before_batch=99)
        rows = sorted(tuple(r) for p in parts for r in p.collect())
        assert rows == [(1, 0, 1), (2, 0, 2), (3, 0, 3)]
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {orphan}")
        if man:
            for e in man["epochs"]:
                spark.sql(f"DROP TABLE IF EXISTS {e['table']}")


def test_gate_refuses_on_checkpoint_reset(spark, tmp_path):
    """ADVICE round-7: state kept but checkpoint lost → batch ids
    restart at 0 below the store's newest batch; the gate must refuse
    rather than probe an empty corpus and clobber prior output."""
    src = str(tmp_path / "feed")
    state = str(tmp_path / "state")
    _append(spark, src, [(1, DOC_A)])
    _write_state(spark, state, "bands", {0: [(1, 0, 1)], 2: [(3, 0, 3)]})
    _write_state(spark, state, "sigs", {0: [(1, [1])], 2: [(3, [3])]})
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = write_stream_near_dedup(
        stream, "text", "id",
        str(tmp_path / "out"), state, str(tmp_path / "fresh_ckpt"),
    )
    with pytest.raises(Exception, match="checkpoint"):
        try:
            q.processAllAvailable()
        finally:
            q.stop()


def test_gate_refuses_on_manifest_tmp(spark, tmp_path):
    src = str(tmp_path / "feed")
    state = str(tmp_path / "state")
    _append(spark, src, [(1, DOC_A)])
    _write_state(spark, state, "bands", {0: [(1, 0, 1)]})
    with open(f"{state}/bands__manifest____tmp__", "w") as fh:
        fh.write("{}")
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = write_stream_near_dedup(
        stream, "text", "id",
        str(tmp_path / "out"), state, str(tmp_path / "ckpt"),
    )
    with pytest.raises(Exception, match="recover_near_dedup_state"):
        try:
            q.processAllAvailable()
        finally:
            q.stop()


def test_manifest_recovery_rolls_forward_and_back(spark, tmp_path):
    state = str(tmp_path / "state")
    _write_state(spark, state, "bands", {
        0: [(1, 0, 1)], 1: [(2, 0, 2)], 2: [(3, 0, 3)],
    })
    compact_near_dedup_state(
        spark, state, kinds=("bands",), bucket=True, num_buckets=2,
    )
    man = json.loads(open(f"{state}/bands__manifest__").read())
    try:
        # FORWARD: a complete tmp (epoch folders exist) beats the old
        # pointer — simulate a crash between tmp-write and move-in.
        newer = dict(man, label=man["label"])  # same content, valid
        with open(f"{state}/bands__manifest____tmp__", "w") as fh:
            fh.write(json.dumps(newer))
        summary = recover_near_dedup_state(state, kinds=("bands",))
        assert "bands:manifest-forward" in summary
        assert not os.path.exists(f"{state}/bands__manifest____tmp__")
        assert json.loads(
            open(f"{state}/bands__manifest__").read(),
        )["label"] == man["label"]

        # BACK: an unparseable tmp means the crash was mid-write —
        # nothing moved; drop the tmp, keep the old manifest.
        with open(f"{state}/bands__manifest____tmp__", "w") as fh:
            fh.write('{"label": 1, "epo')  # torn write
        summary = recover_near_dedup_state(state, kinds=("bands",))
        assert "bands:manifest-back" in summary
        assert json.loads(
            open(f"{state}/bands__manifest__").read(),
        ) == man

        # the probe view still sees every admitted row
        parts = _read_state_parts(spark, state, "bands", before_batch=99)
        rows = sorted(
            tuple(r) for p in parts for r in p.collect()
        )
        assert rows == [(1, 0, 1), (2, 0, 2), (3, 0, 3)]
    finally:
        for e in man["epochs"]:
            spark.sql(f"DROP TABLE IF EXISTS {e['table']}")


def test_plain_compaction_refuses_bucketed_store(spark, tmp_path):
    state = str(tmp_path / "state")
    _write_state(spark, state, "bands", {
        0: [(1, 0, 1)], 1: [(2, 0, 2)], 2: [(3, 0, 3)],
    })
    compact_near_dedup_state(
        spark, state, kinds=("bands",), bucket=True, num_buckets=2,
    )
    man = json.loads(open(f"{state}/bands__manifest__").read())
    try:
        with pytest.raises(RuntimeError, match="bucket=True"):
            compact_near_dedup_state(spark, state, kinds=("bands",))
    finally:
        for e in man["epochs"]:
            spark.sql(f"DROP TABLE IF EXISTS {e['table']}")


def test_epoch_table_reregisters_after_catalog_loss(spark, tmp_path):
    state = str(tmp_path / "state")
    _write_state(spark, state, "bands", {
        0: [(1, 0, 1)], 1: [(2, 0, 2)], 2: [(3, 0, 3)],
    })
    compact_near_dedup_state(
        spark, state, kinds=("bands",), bucket=True, num_buckets=2,
    )
    man = json.loads(open(f"{state}/bands__manifest__").read())
    try:
        # simulate catalog loss: drop the table, keep the data+manifest
        spark.sql(f"DROP TABLE {man['epochs'][0]['table']}")
        parts = _read_state_parts(spark, state, "bands", before_batch=99)
        rows = sorted(tuple(r) for p in parts for r in p.collect())
        assert rows == [(1, 0, 1), (2, 0, 2), (3, 0, 3)]
        assert spark.catalog.tableExists(man["epochs"][0]["table"])
    finally:
        for e in man["epochs"]:
            spark.sql(f"DROP TABLE IF EXISTS {e['table']}")
