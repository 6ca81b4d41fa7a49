"""CLI entry point: ``python -m delivr_cfos_tpu [config.json]``.

Drop-in replacement for the reference's ``python __main__.py <config>``
(reference: __main__.py:48-67): same single positional config argument, same
default, same HOOK protocol on stdout.
"""

from __future__ import annotations

import argparse

from delivr_cfos_tpu.config import PipelineConfig
from delivr_cfos_tpu.pipeline.runner import run_pipeline


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="DELIVR inference pipeline (TPU)")
    parser.add_argument(
        "config",
        metavar="config",
        type=str,
        nargs="*",
        default="config.json",
        help="Path to the config file (default ./config.json)",
    )
    args = parser.parse_args(argv)
    config_location = args.config
    if config_location == "config.json":
        print(
            "Warning: using internal default config. If you tried using your "
            "own, please double-check the path!"
        )
    if isinstance(config_location, list):
        config_location = config_location[0]
    print(f"Loading {config_location}")
    cfg = PipelineConfig.from_json(config_location)
    run_pipeline(cfg)


if __name__ == "__main__":
    main()
