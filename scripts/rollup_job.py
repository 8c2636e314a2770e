"""``ray job submit`` entrypoint for the rollup engine.

Usage (cluster):
    ray job submit --working-dir . -- \
        python scripts/rollup_job.py --input /data/transcripts \
        --output /data/rollup_out --gap-fill linear

Local (this sandbox):
    python scripts/rollup_job.py --input <parquet dir> --output /tmp/out

The job is resumable: re-submitting with the same --output skips completed
partitions (per-partition manifests, state/checkpoint.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--num-partitions", type=int, default=256)
    p.add_argument("--gap-fill", default="linear", choices=["none", "prev", "linear"])
    p.add_argument("--hot-threshold", type=int, default=100_000)
    p.add_argument("--no-points", action="store_true")
    p.add_argument("--features-json", default=None, help="JSON list of feature specs")
    p.add_argument("--num-cpus", type=int, default=None, help="local mode only")
    args = p.parse_args()

    import ray

    if not ray.is_initialized():
        # under `ray job submit` the cluster address comes from the
        # environment; local fallback for the sandbox
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
        )

    from light_curve_feature_ray.stages.rollup import RollupConfig
    from light_curve_feature_ray.state.checkpoint import run_rollup_job

    kwargs = {}
    if args.features_json:
        kwargs["features"] = tuple(json.loads(args.features_json))
    config = RollupConfig(
        num_partitions=args.num_partitions,
        gap_fill=args.gap_fill,
        hot_threshold=args.hot_threshold,
        store_points=not args.no_points,
        **kwargs,
    )
    summary = run_rollup_job(args.input, args.output, config)
    print(json.dumps(summary))
    ray.shutdown()


if __name__ == "__main__":
    main()
