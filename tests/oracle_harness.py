"""Local stand-in for the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB over the same parquet, compare
row-count + column names + order-insensitive value hash."""

import hashlib
import math


def canon_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    return str(v)


def value_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "|".join(canon_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def compare(spark_df, duck_rel):
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = spark_df.columns
    d_rows = duck_rel.fetchall()
    d_cols = [d[0] for d in duck_rel.description]
    res = {
        "rows": (len(s_rows), len(d_rows)),
        "cols": (sorted(s_cols), sorted(d_cols)),
        "rows_match": len(s_rows) == len(d_rows),
        "cols_match": sorted(s_cols) == sorted(d_cols),
    }
    if res["cols_match"]:
        res["hash"] = (value_hash(s_rows, s_cols), value_hash(d_rows, d_cols))
        res["hash_match"] = res["hash"][0] == res["hash"][1]
    else:
        res["hash_match"] = False
    return res


def run_all(spark, sf_dir, names=None):
    import duckdb

    import __spark_entry__ as entry

    QUERIES = {k: v for k, v in entry.queries().items() if k in entry.oracle_sql()}
    ORACLES = entry.oracle_sql()

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    results = {}
    for name, fn in QUERIES.items():
        if names and name not in names:
            continue
        try:
            df = fn(spark, sf_dir)
            rel = con.sql(ORACLES[name])
            results[name] = compare(df, rel)
        except Exception as e:  # noqa: BLE001
            results[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
    return results
