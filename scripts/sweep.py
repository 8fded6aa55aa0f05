"""Full-registry driver-mirror sweep: every queries() entry vs its
DuckDB oracle at the given SF dir. Usage: python scripts/sweep.py [sf_dir]."""
import sys, time, traceback

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from deepref_spark.session import get_spark  # noqa: E402
import deepref_spark.queries as Q  # noqa: E402
from harness import compare_query, duck_connection  # noqa: E402

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
spark = get_spark()
con = duck_connection(sf_dir)

names = [n for n in Q.REGISTRY if only is None or n in only]
n_pass = n_rows_only = n_fail = 0
for i, name in enumerate(names):
    spec = Q.REGISTRY[name]
    oracle = Q.oracle_sql_for(name)
    t0 = time.time()
    try:
        if oracle is None:
            cnt = spec["spark"](spark, sf_dir).count()
            n_rows_only += 1
            print(f"[{i+1}/{len(names)}] {name}: ROWS-ONLY {cnt} rows ({time.time()-t0:.1f}s)")
        else:
            ok, detail = compare_query(spark, con, spec["spark"], oracle, sf_dir)
            if ok:
                n_pass += 1
                print(f"[{i+1}/{len(names)}] {name}: PASS {detail} ({time.time()-t0:.1f}s)")
            else:
                n_fail += 1
                print(f"[{i+1}/{len(names)}] {name}: FAIL {detail}")
    except Exception as e:
        n_fail += 1
        print(f"[{i+1}/{len(names)}] {name}: ERROR {e}")
        traceback.print_exc()

print(f"\nTOTAL: {n_pass} oracle-pass, {n_rows_only} rows-only, {n_fail} fail "
      f"of {len(names)}")
sys.exit(1 if n_fail else 0)
