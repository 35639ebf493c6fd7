#!/usr/bin/env python
"""Evidence tool: per-operator Ray Data stats for the flagship extraction.

Usage: python scripts/stage_stats.py [corpus_dir]
Prints ds.stats() after a full streaming run (read -> extract -> write)
so per-stage wall/UDF time and block shapes are inspectable.
"""
from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, log_to_driver=False)

    from node_html_parser_ray.sources.corpus import write_corpus
    from node_html_parser_ray.stages.extract_stage import extract_batch

    if len(sys.argv) > 1:
        corpus = sys.argv[1]
        files = [os.path.join(corpus, f) for f in sorted(os.listdir(corpus))
                 if f.endswith(".parquet")]
    else:
        corpus = "/tmp/nhpr_stats_corpus"
        if not os.path.isdir(corpus):
            write_corpus(corpus, n_docs=20000, seed=5, rows_per_file=2000)
        files = [os.path.join(corpus, f) for f in sorted(os.listdir(corpus))
                 if f.endswith(".parquet")]

    out = "/tmp/nhpr_stats_out"
    ds = ray.data.read_parquet(files, override_num_blocks=len(files))
    ds = ds.map_batches(extract_batch, batch_format="pyarrow", batch_size=128)
    ds.write_parquet(out, use_dictionary=False)
    print(ds.stats())
    shutil.rmtree(out, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
