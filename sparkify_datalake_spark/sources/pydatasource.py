"""Custom Python DataSource connector (Spark 4 extension surface).

Spark 4 lets an engine ship first-class connectors written in Python
(``pyspark.sql.datasource``): the planner asks the reader for input
partitions (parallelism), offers filters for pushdown, and executes each
partition's ``read`` on a separate worker — the same contract a JVM
DSv2 connector implements. This module provides ``SyntheticDocsSource``,
a deterministic document-feed connector used to pin that surface:

- **partition planning**: ``partitions()`` returns N independent splits,
  so a 1000-executor cluster reads 1000 splits concurrently — scaling is
  decided by the connector, not a repartition after the fact;
- **filter pushdown**: ``pushFilters`` accepts ``EqualTo(category)`` and
  doc_id range filters, narrowing what each split *generates* (for a
  real feed: what it fetches) instead of filtering post-scan. Unsupported
  filters are returned to Spark, which re-applies them — the contract
  that makes pushdown always-safe;
- **determinism**: content is pure arithmetic on ``doc_id`` (no RNG), so
  re-reads and retried tasks produce byte-identical rows — required for
  Spark's task-retry model (a non-deterministic source breaks exactly-
  once semantics under speculative execution).

Worker-pickling note (SURVEY §7.3): a class normally pickles by module
reference, requiring executors to have the package importable
(``--py-files``/images on a real cluster; NOT true for a foreign-cwd
driver's Python workers). ``register()`` therefore marks this module
for cloudpickle pickle-by-value, embedding the class definition in the
pickle itself — the connector works on workers that cannot import the
package. Verified via the driver-sim recipe (foreign session from
``/tmp``).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    Filter,
    GreaterThan,
    InputPartition,
    LessThan,
    WriterCommitMessage,
)

CATEGORIES = ("news", "code", "wiki", "forum", "paper")


def _row(doc_id: int) -> tuple[int, str, float, str]:
    """Deterministic row content from the id alone (pure arithmetic)."""
    cat = CATEGORIES[(doc_id * 2654435761) % len(CATEGORIES)]
    score = round(((doc_id * 40503) % 10_000) / 10_000.0, 4)
    text = f"synthetic document {doc_id} in {cat} " + "lorem " * (doc_id % 7)
    return doc_id, cat, score, text.rstrip()


class _DocsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n_partitions = int(options.get("partitions", 8))
        self.rows_per_partition = int(options.get("rows_per_partition", 1000))
        # Pushed-down narrowing state (None = no constraint).
        self.category: str | None = None
        self.id_lo: int | None = None  # exclusive lower bound
        self.id_hi: int | None = None  # exclusive upper bound

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Accept category equality and doc_id range filters; hand
        everything else back for Spark to evaluate post-scan."""
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("category",):
                self.category = f.value
            elif isinstance(f, GreaterThan) and f.attribute == ("doc_id",):
                self.id_lo = int(f.value)
            elif isinstance(f, LessThan) and f.attribute == ("doc_id",):
                self.id_hi = int(f.value)
            else:
                yield f  # unsupported → Spark re-applies it

    def partitions(self) -> Sequence[InputPartition]:
        return [InputPartition(i) for i in range(self.n_partitions)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        start = partition.value * self.rows_per_partition
        stop = start + self.rows_per_partition
        # Range pushdown narrows what this split generates at the source.
        if self.id_lo is not None:
            start = max(start, self.id_lo + 1)
        if self.id_hi is not None:
            stop = min(stop, self.id_hi)
        for doc_id in range(start, stop):
            row = _row(doc_id)
            if self.category is not None and row[1] != self.category:
                continue
            yield row


class SyntheticDocsSource(DataSource):
    """``spark.read.format("synthetic_docs")`` after registration."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id bigint, category string, score double, text string"

    def reader(self, schema) -> _DocsReader:  # noqa: ANN001 (API signature)
        return _DocsReader(dict(self.options))

    def writer(self, schema, overwrite):  # noqa: ANN001 (API signature)
        return _JsonlWriter(dict(self.options), overwrite)


def register(spark) -> None:  # noqa: ANN001
    """Idempotently register the connector on a session.

    Python-source filter pushdown is opt-in (off by default in Spark
    4.1); the conf is runtime-settable, so flip it here rather than
    requiring session-build-time wiring. The module is registered for
    cloudpickle pickle-by-value so the class ships inside the pickle —
    executors do not need the package on their PYTHONPATH.
    """
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticDocsSource)


# ---------------------------------------------------------------------------
# Writer half of the connector surface: the same DataSource class can
# also be a SINK. Spark calls writer(schema, overwrite); each task runs
# write(rows) and returns a commit message; the driver then calls
# commit(messages) exactly once iff every task succeeded (abort
# otherwise) — the two-phase commit contract a JVM DSv2 writer gets.


@dataclass
class _FileCommit(WriterCommitMessage):
    filename: str
    n_rows: int


class _JsonlWriter(DataSourceWriter):
    """Task-side JSONL writer with driver-side two-phase commit.

    Tasks write to uniquely-named ``.staged-*`` files (task retries and
    speculative duplicates never collide, losers are never committed);
    ``commit`` renames the winning files into place and drops a
    ``_SUCCESS`` marker listing them, so readers (and `abort`) can
    distinguish committed data from orphaned staging debris.
    """

    def __init__(self, options: dict, overwrite: bool) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("path option is required for writes")
        self.overwrite = overwrite

    def write(self, iterator):  # noqa: ANN001 — API signature
        import json
        import os
        import uuid

        def jsonable(v):  # Decimal / datetime / bytes land as strings
            return float(v) if type(v).__name__ == "Decimal" else str(v)

        os.makedirs(self.path, exist_ok=True)
        name = f".staged-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(self.path, name), "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict(), default=jsonable) + "\n")
                n += 1
        return _FileCommit(filename=name, n_rows=n)

    def commit(self, messages) -> None:  # noqa: ANN001
        import json
        import os

        final = []
        for m in messages:
            committed = m.filename.removeprefix(".staged-")
            os.rename(
                os.path.join(self.path, m.filename),
                os.path.join(self.path, committed),
            )
            final.append({"file": committed, "n_rows": m.n_rows})
        with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
            json.dump(final, fh)

    def abort(self, messages) -> None:  # noqa: ANN001
        import os

        for m in messages:
            try:
                os.remove(os.path.join(self.path, m.filename))
            except FileNotFoundError:
                pass
