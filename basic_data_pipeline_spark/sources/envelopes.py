"""Deterministic Debezium-envelope generator for CDC tests.

Replaces the reference's MySQL + Debezium + Kafka containers
(/root/reference/data_inserter.py + register-connector.sh) with an
in-memory stream of the same JSON envelope shape (FIXTURES.md B2):
``{"payload": {"op", "before", "after", "source": {"ts_ms", "table"},
"ts_ms"}}`` on topics named ``dbserver1.<db>.<table>``.

The workload mirrors data_inserter.py:28-66 (insert/update/delete over an
``employees`` table with name/position/salary) but is seeded and
replayable — the property the reference approximates with its
earliest-offset replay policy (consumer_to_file.py:185-187).
"""

from __future__ import annotations

import json
import random
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

NAMES = ["Alice", "Bob", "Charlie", "Diana", "Eve", "Frank", "Grace", "Heidi"]
POSITIONS = ["Data Engineer", "DevOps Engineer", "Analyst", "Manager", "Tester"]


@dataclass
class Envelope:
    topic: str
    op: str
    before: dict | None
    after: dict | None
    ts_ms: int
    partition: int = 0
    offset: int = 0

    def to_kafka_row(self) -> tuple[str, str, int, int]:
        payload = {
            "op": self.op,
            "before": self.before,
            "after": self.after,
            "source": {"ts_ms": self.ts_ms, "table": self.topic.rsplit(".", 1)[-1]},
            "ts_ms": self.ts_ms + 123,
        }
        return (self.topic, json.dumps({"payload": payload}), self.partition, self.offset)


def employee_workload(
    n_snapshot: int = 20,
    n_ops: int = 60,
    seed: int = 42,
    topic: str = "dbserver1.testdb.employees",
    schema_drift_at: int | None = None,
) -> list[Envelope]:
    """Seeded snapshot + random DML tail, like snapshot.mode=initial
    followed by binlog tailing (register-connector.sh:20).

    After ``schema_drift_at`` ops, new inserts use the drifted shape
    (``role`` instead of position/salary — setup.sh:59-66), exercising
    schema evolution (S9).
    """
    rng = random.Random(seed)
    rows: dict[int, dict] = {}
    out: list[Envelope] = []
    ts = 1_722_900_000_000
    offset = 0
    next_id = 1

    def mk_row(i: int, drifted: bool) -> dict:
        base = {"id": i, "name": f"{rng.choice(NAMES)}{rng.randint(100, 999)}"}
        if drifted:
            base["role"] = rng.choice(POSITIONS)
        else:
            base["position"] = rng.choice(POSITIONS)
            base["salary"] = float(rng.randint(50_000, 200_000))
        base["updated_on"] = ts
        return base

    for _ in range(n_snapshot):
        row = mk_row(next_id, False)
        rows[next_id] = row
        out.append(Envelope(topic, "r", None, row, ts, 0, offset))
        next_id += 1
        offset += 1
        ts += 1000

    for i in range(n_ops):
        drifted = schema_drift_at is not None and i >= schema_drift_at
        choice = rng.random()
        if choice < 0.5 or not rows:
            row = mk_row(next_id, drifted)
            rows[next_id] = row
            out.append(Envelope(topic, "c", None, row, ts, 0, offset))
            next_id += 1
        elif choice < 0.8:
            key = rng.choice(sorted(rows))
            before = rows[key]
            after = dict(before)
            if "salary" in after:
                after["salary"] = float(rng.randint(50_000, 200_000))
            after["name"] = f"{rng.choice(NAMES)}{rng.randint(100, 999)}"
            after["updated_on"] = ts
            rows[key] = after
            out.append(Envelope(topic, "u", before, after, ts, 0, offset))
        else:
            key = rng.choice(sorted(rows))
            out.append(Envelope(topic, "d", rows.pop(key), None, ts, 0, offset))
        offset += 1
        ts += 1000
    return out


def envelopes_to_df(spark: SparkSession, envelopes: list[Envelope]) -> DataFrame:
    """Materialize as the Kafka-source shape: (topic, value, partition,
    offset) — what `spark.readStream.format("kafka")` emits."""
    return spark.createDataFrame(
        [e.to_kafka_row() for e in envelopes],
        "topic string, value string, partition int, offset long",
    )


def expected_final_state(envelopes: list[Envelope]) -> dict[int, dict]:
    """Oracle: replay the envelope list imperatively → expected compacted
    table (latest version per key, deletes applied)."""
    state: dict[int, dict] = {}
    for e in envelopes:
        if e.op in ("c", "u", "r") and e.after is not None:
            state[e.after["id"]] = e.after
        elif e.op == "d" and e.before is not None:
            state.pop(e.before["id"], None)
    return state
