"""Check a single declared query vs its oracle on a bare session."""
import os, sys, time
sys.path.insert(0, ".")
from pyspark.sql import SparkSession
import __spark_entry__ as e
from tests.oracle_harness import compare

names = sys.argv[1].split(",")
sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
)
master = "local[%s]" % os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = SparkSession.builder.master(master).appName("check_one").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
qs, os_ = e.queries(), e.oracle_sql()
rc = 0
for name in names:
    t = time.time()
    try:
        df = qs[name](spark, sf_dir)
        if name in os_:
            r = compare(df, os_[name], sf_dir)
            ok = r.get("hash_match", False)
            print(name, "HASH-OK" if ok else "MISMATCH", round(time.time()-t,1), "s", "" if ok else r)
            rc |= 0 if ok else 1
        else:
            n = df.count()
            print(name, "ROWS-ONLY", n, "rows", round(time.time()-t,1), "s")
    except Exception as ex:
        import traceback; traceback.print_exc()
        print(name, "ERR", ex)
        rc |= 2
sys.exit(rc)
