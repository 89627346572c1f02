"""SURVEY §2 ↔ registry consistency guard (VERDICT r4 item #3).

§2 is the self-referential contract: every table row there must be a
`queries()` key (check = hash/rows) or a pytest-verified test-class
capability (check = test), and nothing may ship in the registry without
a §2 row. Round 4 found one drift (`udf_arrow_scalar` registered but
missing its §2 row); this test makes that class of drift impossible to
miss again.

Parser contract: §2 spans from the `## §2.` heading to the `### §2.1`
reference-mapping section (whose rows are reconstructed reference ops,
not queries). Inventory rows are markdown table lines whose first cell
is a backticked name; the check class is the last cell (`hash`, `rows`,
or `test`, optionally annotated, e.g. "hash (all 3 SFs)").
"""

from __future__ import annotations

import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _survey_rows() -> dict[str, str]:
    text = open(os.path.join(REPO, "SURVEY.md")).read()
    start = text.index("## §2. Operator inventory")
    end = text.index("### §2.1")
    rows: dict[str, str] = {}
    for line in text[start:end].splitlines():
        m = re.match(r"\|\s*`([A-Za-z0-9_]+)`[^|]*\|", line)
        if not m:
            continue
        cells = [c.strip() for c in line.strip().strip("|").split("|")]
        check = cells[-1].split()[0] if cells[-1] else ""
        if check not in {"hash", "rows", "test"}:
            continue
        name = m.group(1)
        assert name not in rows, f"duplicate §2 row: {name}"
        rows[name] = check
    return rows


def test_survey_section2_matches_registry():
    from sparkify_datalake_spark.registry import queries

    rows = _survey_rows()
    assert len(rows) > 250, "parser regression: §2 table rows not found"

    declared = {n for n, c in rows.items() if c in {"hash", "rows"}}
    test_class = {n for n, c in rows.items() if c == "test"}
    registered = set(queries())

    missing_from_registry = declared - registered
    missing_from_survey = registered - declared
    assert not missing_from_registry, (
        f"§2 declares query rows with no registry entry: "
        f"{sorted(missing_from_registry)}"
    )
    assert not missing_from_survey, (
        f"registry keys with no §2 row (add the row): "
        f"{sorted(missing_from_survey)}"
    )

    # test-class rows must never leak into the registry, and each must
    # exist as a real capability (spot-pinned to the known set so a
    # renamed sink/streaming test can't silently orphan its row).
    assert not (test_class & registered)
    assert test_class == {
        "write_bucketed_table",
        "sink_parquet_partitioned",
        "sink_csv_json_roundtrip",
        "overwrite_partitions_dynamic",
        "upsert_by_key",
        "compact_parquet",
        "stream_watermark_late",
        "stream_stateful_dedup",
        "stream_static_enrich",
        "stream_join_left_outer",
        "dedup_store_vacuum",  # round 8: store compaction lifecycle
        # round 9 (VERDICT r8 #5): stream -> ingest -> vacuum pipeline
        "stream_ingest_vacuum_lifecycle",
        # round 10 (VERDICT r9 #4): IVM-maintained scorecard grains
        "scorecard_incremental_maintenance",
        # round 11 (VERDICT r10 #7): IVM-maintained DAU/WAU user_days
        "dau_wau_incremental_maintenance",
    }, f"test-class rows drifted: {sorted(test_class)}"


def test_survey_check_class_matches_oracle_presence():
    from sparkify_datalake_spark.registry import oracle_sql, queries

    rows = _survey_rows()
    queries()  # fills the lazy oracle map
    oracles = set(oracle_sql())
    hash_rows = {n for n, c in rows.items() if c == "hash"}
    rows_only = {n for n, c in rows.items() if c == "rows"}

    assert hash_rows - oracles == set(), (
        f"§2 hash rows without an oracle: {sorted(hash_rows - oracles)}"
    )
    assert rows_only & oracles == set(), (
        f"§2 rows-only rows that DO have an oracle (upgrade the §2 "
        f"check class): {sorted(rows_only & oracles)}"
    )
