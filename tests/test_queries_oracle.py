"""Oracle gate rehearsal: run every declared query through Spark AND its
DuckDB oracle SQL at sf0.001, compare row count, column names, and values
(sorted column-name order, sorted rows) — the driver's CORRECTNESS check.
"""

import math

import duckdb
import pytest

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(val):
    if val is None:
        return None
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        return round(val, 9)
    if hasattr(val, "isoformat"):
        return val.isoformat()
    if isinstance(val, (list, tuple)) or type(val).__name__ == "ndarray":
        return tuple(_canon(v) for v in val)
    return val


def _rows(pdf):
    cols = sorted(pdf.columns)
    rows = [tuple(_canon(v) for v in row) for row in pdf[cols].itertuples(index=False)]
    return cols, sorted(rows, key=lambda r: tuple(str(x) for x in r))


def _query_names():
    from fourmc_spark.queries import ORACLE, QUERIES

    assert set(ORACLE) <= set(QUERIES)
    return sorted(QUERIES)


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(spark, sf_dir, duck, name):
    from fourmc_spark.queries import ORACLE, QUERIES

    sdf = QUERIES[name](spark, sf_dir).toPandas()
    # Driver-canon rehearsal: the driver's own canonicalizer runs pandas
    # sort_values over EVERY output column before hashing, which raises
    # "TypeError: unhashable type: 'list'" on raw array cells — the only
    # two CORRECTNESS_r03 failures. Run the exact same operation here so
    # a list-typed gate output can never reach the driver again.
    if len(sdf.columns):
        sdf.sort_values(list(sdf.columns))
    if name not in ORACLE:
        assert len(sdf) >= 0  # rows-only check (non-SQL-expressible op)
        return
    ddf = duck.execute(ORACLE[name]).df()
    assert sorted(sdf.columns) == sorted(ddf.columns), (
        f"{name}: column mismatch {sorted(sdf.columns)} vs {sorted(ddf.columns)}"
    )
    assert len(sdf) == len(ddf), f"{name}: row count {len(sdf)} vs {len(ddf)}"
    s_cols, s_rows = _rows(sdf)
    d_cols, d_rows = _rows(ddf)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


def test_documents_text_is_ascii(duck):
    # The multimodal_resize / multimodal_frames oracles slice the text with
    # DuckDB varchar substring and md5 it; the Spark side slices utf-8
    # BYTES. Those agree only while documents.text is pure ASCII — pin it.
    n = duck.execute(
        "SELECT count(*) FROM documents "
        "WHERE octet_length(encode(text)) != length(text)"
    ).fetchone()[0]
    assert n == 0
