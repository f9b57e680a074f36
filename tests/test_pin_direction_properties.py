"""Seeded property soak of the pin-relative remap alignment
(sources/pyds.py _pin_directions + _frame_align_entry): a table whose
history is a random interleaving of appends and column RENAMES (chains
included — a column may be renamed many times), read through stream
readers pinned at EVERY version, draining random sub-ranges.

The data model makes misalignment undetectable-proof: two value
columns carry distinct formulas (v = id*2, w = id*3) whatever their
current names, so a reader that loses the mapping surfaces NULLs and a
reader that crosses the mappings surfaces the wrong formula. For every
pin p and every drained range (s, e], each returned row must carry
exactly its formula values under the era-p names — covering forward
alignment (ranges before ops at/before the pin), reverse alignment
(ranges after ops past the pin), chains split across ranges (the r10
bug), and chains spanning the pin itself."""

from __future__ import annotations

import random

import pyarrow as pa

from finalpipeline_spark.sources.pyds import (
    VersionedStreamReader,
    _live_manifests,
)
from finalpipeline_spark.sources.versioned import VersionedTable

_META = [
    ("_change_type", "string"),
    ("_commit_version", "bigint"),
    ("_commit_timestamp", "timestamp"),
]


def _drain(reader, s, e, live):
    rows = []
    for p in reader._cdf_partitions({"version": s}, s, e, live):
        for b in reader.read(p):
            rows += pa.Table.from_batches([b]).to_pylist()
    return rows


def test_pin_alignment_under_random_rename_chains(spark, tmp_path):
    rng = random.Random(0x5EED11)
    t = VersionedTable(spark, str(tmp_path / "vt"))
    names = {"v": "v", "w": "w"}  # logical formula key -> current name
    fresh = iter(f"c{i}" for i in range(100))
    t.commit_overwrite(
        spark.range(0, 10).selectExpr("id", "id * 2 as v", "id * 3 as w")
    )
    # era_names[p] = {formula key: its name in version p's schema};
    # ids_at[v] = ids appended by commit v (empty for renames)
    era_names = {0: dict(names)}
    ids_at = {0: list(range(10))}
    nxt = 10
    for step in range(14):
        if rng.random() < 0.45:
            key = rng.choice(["v", "w"])
            # sometimes rename BACK to a name this column held before
            # (A→B→A chains — undecidable for the retired r10
            # membership inference, well-defined under the pin)
            past = [
                e[key]
                for e in era_names.values()
                if e[key] not in names.values()
            ]
            new = (
                rng.choice(past)
                if past and rng.random() < 0.35
                else next(fresh)
            )
            t.rename_column(names[key], new)
            names[key] = new
            ids_at[t.latest_version()] = []
        else:
            n = rng.randrange(3, 9)
            t.commit_append(
                spark.range(nxt, nxt + n).selectExpr(
                    "id", f"id * 2 as {names['v']}", f"id * 3 as {names['w']}"
                )
            )
            ids_at[t.latest_version()] = list(range(nxt, nxt + n))
            nxt += n
        era_names[t.latest_version()] = dict(names)
    # guaranteed A→B→A chain with data in every era, whatever the
    # random walk did above
    orig = names["v"]
    mid = next(fresh)
    for new_name, n in ((mid, 4), (orig, 4)):
        t.rename_column(names["v"], new_name)
        names["v"] = new_name
        ids_at[t.latest_version()] = []
        era_names[t.latest_version()] = dict(names)
        t.commit_append(
            spark.range(nxt, nxt + n).selectExpr(
                "id", f"id * 2 as {names['v']}", f"id * 3 as {names['w']}"
            )
        )
        ids_at[t.latest_version()] = list(range(nxt, nxt + n))
        era_names[t.latest_version()] = dict(names)
        nxt += n
    head = t.latest_version()
    live = _live_manifests(t.root)

    for pin in range(head + 1):
        vp, wp = era_names[pin]["v"], era_names[pin]["w"]
        reader = VersionedStreamReader(
            t.root,
            [("id", "bigint"), (vp, "bigint"), (wp, "bigint")] + _META,
            cdf=True,
            pin_version=pin,
        )
        # random split points over the full history, always incl. head
        cuts = sorted(
            {0, head} | set(rng.sample(range(1, head), min(4, head - 1)))
        )
        for s, e in zip(cuts, cuts[1:]):
            rows = _drain(reader, s, e, live)
            expect = [i for v in range(s + 1, e + 1) for i in ids_at[v]]
            assert sorted(x["id"] for x in rows) == sorted(expect), (
                pin, s, e
            )
            for x in rows:
                assert x[vp] == x["id"] * 2, (pin, s, e, x)
                assert x[wp] == x["id"] * 3, (pin, s, e, x)
