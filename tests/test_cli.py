"""CLI smoke tests (run in-process on the forced-CPU test topology)."""

import numpy as np
import pytest

from mpopis_tpu.harness.cli import build_parser, main


def test_parser_subcommands_and_defaults():
    ap = build_parser()
    args = ap.parse_args(["car", "--cars", "2", "--policy", "cmamppi"])
    assert args.cars == 2 and args.policy == "cmamppi"
    assert args.samples == 150 and args.horizon == 50 and args.lam == 10.0
    args = ap.parse_args(["mountaincar"])
    assert args.samples == 20 and args.horizon == 15 and args.lam == 0.1
    args = ap.parse_args(["mujoco", "--env-name", "Swimmer-v4"])
    assert args.env_name == "Swimmer-v4"
    assert args.frame_skip is None  # host path resolves None -> 5


def test_cli_mountaincar_runs(capsys):
    rc = main([
        "mountaincar", "--policy", "gmppi", "--samples", "8",
        "--horizon", "6", "--steps", "10", "--seed", "1", "--trials", "1",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "MountainCar" in out and "Trials AVE" in out


def test_cli_missing_subcommand_errors():
    with pytest.raises(SystemExit):
        build_parser().parse_args([])
