"""In-session interleaved A/B: old interpreted-HOF vector operators
(loaded from git HEAD via a renamed module) vs the r15 Arrow-kernel
versions. Alternates old/new per repetition in ONE session so host
drift cancels (the r14 NOTES discipline). Usage:

    python3 plans/r15/ab_vector.py [reps]
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys
import time

_REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, _REPO)

from kickstarter_etl_pipeline_spark.session import get_spark  # noqa: E402
from kickstarter_etl_pipeline_spark.sources.readers import load_table  # noqa: E402
from kickstarter_etl_pipeline_spark.operators import similarity as NEW  # noqa: E402

# Materialize the pre-r15 module under a different name.
_old_src = subprocess.run(
    ["git", "show", "HEAD:kickstarter_etl_pipeline_spark/operators/similarity.py"],
    cwd=_REPO, capture_output=True, text=True, check=True,
).stdout
_old_path = "/tmp/similarity_head.py"
with open(_old_path, "w") as fh:
    fh.write(_old_src)
spec = importlib.util.spec_from_file_location("similarity_head", _old_path)
OLD = importlib.util.module_from_spec(spec)
spec.loader.exec_module(OLD)


def force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    names = sys.argv[2:] or ["ivf", "pca", "sem", "bf", "mmr"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r15-ab-vector")
    spark.sparkContext.setLogLevel("ERROR")

    def build(mod, name):
        emb = load_table(spark, sf_dir, "embeddings")
        if name == "ivf":
            return mod.ivf_lloyd_topk(
                emb, mod.query_anchors(emb, 20), k=5, n_clusters=8, n_probe=4, n_iters=5
            )
        if name == "pca":
            return mod.pca_top_component(emb)
        if name == "sem":
            return mod.semantic_dedup(emb)
        if name == "bf":
            return mod.brute_force_topk(emb, mod.query_anchors(emb, 20), k=5)
        if name == "mmr":
            return mod.mmr_diversified_topk(emb, mod.query_anchors(emb, 20))
        raise ValueError(name)

    # warm both variants at small SFs
    for wd in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        for name in names:
            for mod in (OLD, NEW):
                saved, os.environ["SPARK_GRAFT_SF_DIR"] = os.environ.get("SPARK_GRAFT_SF_DIR"), wd
                emb = load_table(spark, wd, "embeddings")
                os.environ["SPARK_GRAFT_SF_DIR"] = saved or ""
                try:
                    if name == "ivf":
                        force(mod.ivf_lloyd_topk(emb, mod.query_anchors(emb, 20), k=5, n_clusters=8, n_probe=4, n_iters=5))
                    elif name == "pca":
                        force(mod.pca_top_component(emb))
                    elif name == "sem":
                        force(mod.semantic_dedup(emb))
                    elif name == "bf":
                        force(mod.brute_force_topk(emb, mod.query_anchors(emb, 20), k=5))
                    elif name == "mmr":
                        force(mod.mmr_diversified_topk(emb, mod.query_anchors(emb, 20)))
                except Exception as e:  # noqa: BLE001
                    print(f"WARM FAIL {name}: {e}")

    results: dict = {}
    for name in names:
        olds, news = [], []
        for _ in range(reps):
            t0 = time.perf_counter()
            force(build(OLD, name))
            olds.append(round(time.perf_counter() - t0, 3))
            t0 = time.perf_counter()
            force(build(NEW, name))
            news.append(round(time.perf_counter() - t0, 3))
        results[name] = (olds, news)
        print(f"{name}: old {olds} min {min(olds):.3f} | new {news} min {min(news):.3f}")
    print("loadavg", os.getloadavg())


if __name__ == "__main__":
    main()
