"""A/B a runtime SQL-conf set over a query subset in one warmed session.

Usage: python scripts/conf_probe.py <queries-csv> <reps> key=val[,key=val...]

Per query: warm once under baseline, then alternate <reps> timed drains
under baseline ("A") and the probe conf set ("B") — interleaved A/B/A/B
so host-speed drift hits both arms equally (the SELF_VARIANCE protocol).
Report per-query median A and B seconds. Confs are restored between arms
via spark.conf.set/unset (ADVICE r10's restoration discipline).
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakehouse_variance_spark import registry
from lakehouse_variance_spark.session import build_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1].split(",")
    reps = int(sys.argv[2])
    probe: dict[str, str] = dict(kv.split("=", 1) for kv in sys.argv[3].split(","))
    registry.load_all()
    spark = build_session(app_name="lvs-conf-probe")
    spark.sparkContext.setLogLevel("ERROR")

    prior = {}
    for k in probe:
        try:
            prior[k] = spark.conf.get(k)
        except Exception:
            prior[k] = None

    def set_probe(on: bool) -> None:
        for k, v in probe.items():
            if on:
                spark.conf.set(k, v)
            elif prior[k] is not None:
                spark.conf.set(k, prior[k])
            else:
                spark.conf.unset(k)

    for name in names:  # warm (baseline confs)
        registry.QUERIES[name](spark, SF_DIR).count()

    out = {}
    for name in names:
        fn = registry.QUERIES[name]
        a, b = [], []
        for _ in range(reps):
            for arm, acc in (("A", a), ("B", b)):
                set_probe(arm == "B")
                t0 = time.perf_counter()
                fn(spark, SF_DIR).count()
                acc.append(time.perf_counter() - t0)
        set_probe(False)
        ma, mb = statistics.median(a), statistics.median(b)
        out[name] = (ma, mb)
        print(f"{name:32s} A={ma:6.3f} B={mb:6.3f} ratio={mb/ma:5.2f}",
              flush=True)
    ta = sum(v[0] for v in out.values())
    tb = sum(v[1] for v in out.values())
    print(f"{'TOTAL':32s} A={ta:6.3f} B={tb:6.3f} ratio={tb/ta:5.2f}")


if __name__ == "__main__":
    main()
