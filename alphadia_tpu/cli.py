"""Command-line interface.

(reference: alphadia/cli.py:35-316 — argparse front end merging
``--config`` yaml, repeated ``--config-dict`` JSON and direct CLI params
(--file/--directory/--regex/--library/--fasta/--quant-dir/--output);
exit codes: 1 unknown error, 126 business error, 127 user error.)
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

import yaml

from alphadia_tpu import __version__
from alphadia_tpu.exceptions import BusinessError, UserError
from alphadia_tpu.reporting import logger


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        "alphadia-tpu", description="TPU-native DIA search engine"
    )
    # flag set and aliases match the reference CLI (reference cli.py:38-124)
    # so existing alphaDIA invocations work unchanged
    p.add_argument("-v", "--version", action="store_true", help="print version and exit")
    p.add_argument("--check", action="store_true", help="print version string for GUI discovery")
    p.add_argument("-o", "--output", "--output-directory", dest="output", help="output directory")
    p.add_argument("-f", "--file", "--raw-path", dest="file", action="append", default=[], help="raw file path (repeatable)")
    p.add_argument("-d", "--directory", action="append", default=[], help="directory of raw files (repeatable)")
    p.add_argument("-r", "--regex", default=".*", help="regex filter for files from --directory")
    p.add_argument("-l", "--library", "--library-path", dest="library", help="spectral library path")
    p.add_argument("--fasta", "--fasta-path", dest="fasta", action="append", default=[], help="FASTA path (repeatable)")
    p.add_argument("-c", "--config", help="YAML config file")
    p.add_argument(
        "--config-dict",
        action="append",
        default=[],
        help="JSON config override (repeatable)",
    )
    p.add_argument(
        "--quant-dir",
        "--quant-directory",
        dest="quant_dir",
        help="shared quant directory (distributed search)",
    )
    p.add_argument(
        "--profile-dir",
        help="write a jax/XLA profiler trace per raw file into this directory",
    )
    return p


def _get_config_from_args(args) -> dict:
    config: dict = {}
    if args.config:
        with open(args.config) as f:
            config = yaml.safe_load(f) or {}
    return config


def _get_cli_config(args, config: dict) -> dict:
    cli: dict = {}
    for text in args.config_dict:
        patch = json.loads(text)
        _deep_merge(cli, patch)

    raw_paths = _get_raw_path_list_from_args_and_config(args, config)
    if raw_paths:
        cli["raw_paths"] = raw_paths
    if args.library:
        cli["library_path"] = args.library
    if args.fasta:
        cli["fasta_paths"] = list(args.fasta)
    if args.quant_dir:
        cli["quant_directory"] = args.quant_dir
    if args.profile_dir:
        _deep_merge(cli, {"general": {"profile_directory": args.profile_dir}})
    return cli


def _deep_merge(base: dict, patch: dict) -> None:
    for k, v in patch.items():
        if isinstance(v, dict) and isinstance(base.get(k), dict):
            _deep_merge(base[k], v)
        else:
            base[k] = v


def _get_raw_path_list_from_args_and_config(args, config: dict) -> list[str]:
    paths = list(config.get("raw_paths", []) or [])
    paths += list(args.file)
    pattern = re.compile(args.regex)
    for directory in args.directory:
        for p in sorted(Path(directory).iterdir()):
            # Bruker .d raw "files" are directories
            is_raw = p.is_file() or (p.is_dir() and p.suffix.lower() == ".d")
            if is_raw and pattern.search(p.name):
                paths.append(str(p))
    return paths


def run(argv: list[str] | None = None) -> None:
    parser = _build_parser()
    args = parser.parse_args(argv)

    if args.version or args.check:
        print(f"alphadia-tpu {__version__}")
        return

    # honor an explicit platform override before any jax backend init
    # (some site configs register platforms programmatically, so the
    # plain JAX_PLATFORMS env var is not always respected)
    import os

    platform = os.environ.get("ALPHADIA_TPU_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)

    from alphadia_tpu.search_plan import SearchPlan

    try:
        # argument/config assembly failures are USER errors (exit 127),
        # same taxonomy as search-time input problems: missing --config
        # file, malformed --config-dict JSON, nonexistent --directory
        try:
            config = _get_config_from_args(args)
            cli_config = _get_cli_config(args, config)
        except (OSError, ValueError, KeyError, re.error, yaml.YAMLError) as e:
            raise UserError(f"invalid arguments/config: {e}") from e
        output = args.output or config.get("output_directory")
        if not output:
            raise UserError(
                "-o/--output is required (or output_directory in --config)"
            )

        SearchPlan(output, config=config, cli_config=cli_config).run_plan()
    except UserError as e:
        logger.error(f"user error: {e}")
        sys.exit(127)
    except BusinessError as e:
        logger.error(f"business error: {e}")
        sys.exit(126)
    except Exception as e:
        logger.error(f"unknown error: {e}", exc_info=True)
        sys.exit(1)


if __name__ == "__main__":
    run()
