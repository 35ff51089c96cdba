#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: oracle_check.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB with the
sf tables registered as views, and compares: column names (sorted),
row count, and cell values (exact, plus a sorted-rows fallback report).
"""
import duckdb, json, sys, glob, os, math

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return repr(float(v))
    except Exception:
        pass
    return str(v)

def rows_of(rel):
    cols = rel.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    names = [cols[i] for i in order]
    types = [str(rel.types[i]) for i in order]
    data = [tuple(norm_cell(r[i]) for i in order) for r in rel.fetchall()]
    return names, types, data

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(outdir)):
        path = os.path.join(outdir, name)
        if not os.path.isdir(path):
            continue
        got_rel = con.sql(f"SELECT * FROM '{path}/*.parquet'")
        gcols, gtypes, grows = rows_of(got_rel)
        if name not in oracles:
            results[name] = f"ROWS_ONLY rows={len(grows)}" + \
                (" EMPTY!" if not grows else "")
            continue
        try:
            ocols, otypes, orows = rows_of(con.sql(oracles[name]))
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR {e}"
            continue
        if gcols != ocols:
            results[name] = f"SCHEMA_MISMATCH spark={gcols} oracle={ocols}"
            continue
        # Typed-hash parity: the driver hashes cells WITH their types, so a
        # DuckDB HUGEINT (e.g. window SUM over BIGINT) vs Spark BIGINT is a
        # driver FAIL even when every value matches. Catch it here.
        if gtypes != otypes:
            diffs = [f"{c}: spark={g} oracle={o}"
                     for c, g, o in zip(gcols, gtypes, otypes) if g != o]
            results[name] = "TYPE_MISMATCH " + "; ".join(diffs)
            continue
        if len(grows) != len(orows):
            results[name] = f"ROWCOUNT {len(grows)} vs {len(orows)}"
            continue
        if grows == orows:
            results[name] = f"OK rows={len(grows)}"
            continue
        # diagnose: order-only mismatch vs value mismatch
        nkey = lambda row: tuple((v is None, v or "") for v in row)
        if sorted(grows, key=nkey) == sorted(orows, key=nkey):
            results[name] = f"ORDER_ONLY_MISMATCH rows={len(grows)}"
            continue
        ndiff, example = 0, None
        for i, (g, o) in enumerate(zip(grows, orows)):
            if g != o:
                ndiff += 1
                if example is None:
                    example = (i, g, o)
        results[name] = f"VALUE_MISMATCH {ndiff}/{len(grows)} rows; " \
            f"first at row {example[0]}:\n  spark : {example[1]}\n  oracle: {example[2]}"
    bad = 0
    for name, res in sorted(results.items()):
        flag = "PASS" if res.startswith("OK") or res.startswith("ROWS_ONLY") else "FAIL"
        if flag == "FAIL":
            bad += 1
        print(f"[{flag}] {name}: {res}")
    print(f"\n{len(results) - bad}/{len(results)} pass")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main()
