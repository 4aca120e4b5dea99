"""Packaging surface: pyproject entry points resolve, the packaged default
config is the canonical one, and the repo-root CLI shims still expose the
same mains (reference analogue: requirements.txt + INSTALL_script.py)."""

import importlib
import os
import tomllib

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu"


def test_pyproject_parses_and_entry_points_resolve():
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        cfg = tomllib.load(f)
    scripts = cfg["project"]["scripts"]
    assert set(scripts) == {
        "nbody-tpu-train",
        "nbody-tpu-self-feed",
        "nbody-tpu-validate",
        "nbody-tpu-ks-test",
        "nbody-tpu-hpo",
    }
    for target in scripts.values():
        mod_name, func_name = target.split(":")
        fn = getattr(importlib.import_module(mod_name), func_name)
        assert callable(fn)


def test_packaged_default_config_is_canonical():
    # root config.yaml is a symlink into the package so a wheel install
    # (no repo root) and a checkout read the same defaults
    root_cfg = os.path.join(REPO, "config.yaml")
    pkg_cfg = os.path.join(REPO, PKG, "default_config.yaml")
    assert os.path.islink(root_cfg)
    assert os.path.realpath(root_cfg) == os.path.realpath(pkg_cfg)
    cfg = yaml.safe_load(open(pkg_cfg))
    assert {"main", "models", "dataloaders", "trainers"} <= set(cfg)

    from importlib import import_module

    config_mod = import_module(f"{PKG}.utils.config")
    # in a checkout the resolver picks the repo-root symlink; both paths
    # must load identical content either way
    assert yaml.safe_load(open(config_mod.DEFAULT_CONFIG_PATH)) == cfg
    assert os.path.exists(config_mod._PACKAGED_CONFIG)


def test_packaged_data_files_listed():
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        cfg = tomllib.load(f)
    data = cfg["tool"]["setuptools"]["package-data"][PKG]
    assert "default_config.yaml" in data
    assert "native/macro_kernels.cpp" in data


def test_root_shims_reexport_cli_mains():
    import self_feed
    import train
    import validate

    import ks_test

    cli = importlib.import_module(f"{PKG}.cli")
    assert train.main is cli.train_main
    assert self_feed.main is cli.self_feed_main
    assert validate.main is cli.validate_main
    assert ks_test.main is cli.ks_test_main
