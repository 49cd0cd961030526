#!/usr/bin/env python
"""CLI entry: register an image pair from a JSON experiment config.

Equivalent of /root/reference/run.py:8-38 plus the resume flow the reference
README advertises but never implemented (README.md:28-31):

    python run.py -c configs/experiment1/config.json
    python run.py -c config.json -r saved/experiment1/<id>/models/vi_latest.npz
    python run.py -c config.json -o "trainer;no_iters_VI=64" -o "trainer;MCMC=false"

Overrides use the reference's ``;``-separated nested-key syntax
(parse_config.py:323-349) with ``=value`` parsed as JSON when possible.
"""

from __future__ import annotations

import argparse
import json


def _parse_override(spec: str):
    key_path, _, raw = spec.partition("=")
    try:
        value = json.loads(raw)
    except json.JSONDecodeError:
        value = raw
    return key_path, value


def main(argv=None):
    parser = argparse.ArgumentParser(description="ir-sgmcmc-tpu registration")
    parser.add_argument("-c", "--config", required=True, help="JSON config path")
    parser.add_argument("-r", "--resume", default=None, help="checkpoint (.npz) to resume")
    parser.add_argument("-o", "--override", action="append", default=[],
                        metavar="a;b;c=value", help="nested config override")
    parser.add_argument("--run-id", default=None, help="run directory id (default: timestamp)")
    args = parser.parse_args(argv)

    from ir_sgmcmc_tpu.config import Config
    from ir_sgmcmc_tpu.trainer import Trainer

    overrides = dict(_parse_override(s) for s in args.override)
    config = Config.from_file(args.config, run_id=args.run_id, overrides=overrides)
    trainer = Trainer(config, resume=args.resume)
    summaries = trainer.run()
    for s in summaries:
        config.logger.info("summary: %s", json.dumps(s, default=float))
    return summaries


if __name__ == "__main__":
    main()
