"""Breakdown of peak process-tree RSS during a build: JVM vs python workers.

Usage: python tools/bench_rss_breakdown.py [cpus] [n_convs]
"""
import os
import shutil
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import prepare_corpus  # noqa: E402
from sparkbm25.build import BuildParams  # noqa: E402
from sparkbm25.corpus import add_doc_id  # noqa: E402
from sparkbm25.jobs import build_index  # noqa: E402
from sparkbm25.session import get_spark  # noqa: E402


def _tree(root_pid):
    children, rss, comm = {}, {}, {}
    for p in os.listdir("/proc"):
        if not p.isdigit():
            continue
        pid = int(p)
        try:
            with open(f"/proc/{pid}/stat") as f:
                raw = f.read()
            name = raw.split("(", 1)[1].rsplit(")", 1)[0]
            parts = raw.rsplit(")", 1)[1].split()
            ppid = int(parts[1])
            with open(f"/proc/{pid}/statm") as f:
                pages = int(f.read().split()[1])
        except (OSError, IndexError, ValueError):
            continue
        children.setdefault(ppid, []).append(pid)
        rss[pid] = pages * os.sysconf("SC_PAGE_SIZE")
        comm[pid] = name
    out = {}
    stack, seen = [root_pid], set()
    while stack:
        pid = stack.pop()
        if pid in seen:
            continue
        seen.add(pid)
        out[pid] = (comm.get(pid, "?"), rss.get(pid, 0))
        stack.extend(children.get(pid, []))
    return out


class Breakdown:
    def __init__(self):
        self.peaks = {}          # bucket -> peak sum bytes
        self.peak_total = 0
        self.peak_worker = 0     # max single python worker
        self.n_workers_at_peak = 0
        self._stop = threading.Event()

    def _bucket(self, pid, name):
        if pid == os.getpid():
            return "driver_py"
        return "jvm" if "java" in name else "py_workers"

    def _run(self):
        me = os.getpid()
        while not self._stop.is_set():
            t = _tree(me)
            sums, wmax, nw = {}, 0, 0
            for pid, (name, r) in t.items():
                b = self._bucket(pid, name)
                sums[b] = sums.get(b, 0) + r
                if b == "py_workers":
                    nw += 1
                    wmax = max(wmax, r)
            tot = sum(sums.values())
            if tot > self.peak_total:
                self.peak_total = tot
                self.n_workers_at_peak = nw
            for b, v in sums.items():
                self.peaks[b] = max(self.peaks.get(b, 0), v)
            self.peak_worker = max(self.peak_worker, wmax)
            self._stop.wait(0.1)

    def __enter__(self):
        threading.Thread(target=self._run, daemon=True).start()
        return self

    def __exit__(self, *e):
        self._stop.set()
        time.sleep(0.3)
        return False


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_convs = int(sys.argv[2]) if len(sys.argv) > 2 else 50000
    store_pos = len(sys.argv) > 3 and sys.argv[3] == "pos"
    extra = {}
    if os.environ.get("RSSB_MAXREC"):
        extra["spark.sql.execution.arrow.maxRecordsPerBatch"] = \
            os.environ["RSSB_MAXREC"]
    spark = get_spark("rss-breakdown", cores=cpus, shuffle_partitions=cpus,
                      extra_conf=extra)
    corpus_path = prepare_corpus(spark, "0.1", n_convs)
    corpus = add_doc_id(spark.read.parquet(corpus_path), "conv_seq").select(
        "doc_id", "text"
    )
    corpus.count()
    params = BuildParams(
        num_shards=max(cpus, 8), salt_factor=4, num_term_buckets=32,
        lineage_groups=1, doc_id_scheme="conv_seq",
        store_positions=store_pos,
    )
    ix_dir = f"/tmp/sparkbm25_bench/rssb_{cpus}_{store_pos}"
    shutil.rmtree(ix_dir, ignore_errors=True)
    build_index(corpus, ix_dir, params, source_fingerprint=corpus_path)
    shutil.rmtree(ix_dir, ignore_errors=True)
    t0 = time.time()
    with Breakdown() as bd:
        build_index(corpus, ix_dir, params, source_fingerprint=corpus_path)
    wall = time.time() - t0
    gb = 1024 ** 3
    print(f"\nwall {wall:.1f}s  peak_total {bd.peak_total/gb:.2f} GB")
    for b, v in sorted(bd.peaks.items()):
        print(f"  {b:12s} peak {v/gb:.2f} GB")
    print(f"  single py worker peak {bd.peak_worker/gb:.2f} GB; "
          f"{bd.n_workers_at_peak} workers alive at total peak")


if __name__ == "__main__":
    main()
