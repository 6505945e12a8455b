"""Packaging metadata stays truthful.

The reference ships a pip-installable package (reference: pyproject.toml);
ours does too. These tests pin the contract: every console script in
pyproject.toml resolves to a real callable, and every package-data glob
matches at least one shipped file (a renamed static dir or locale file
would otherwise silently vanish from wheels).
"""

import glob
import importlib
import pathlib

try:
    import tomllib  # stdlib on >=3.11
except ImportError:  # pragma: no cover - 3.10 (requires-python >=3.10):
    # tomli is not a declared dependency; skip rather than fail collection
    import pytest

    tomllib = pytest.importorskip(
        "tomli", reason="needs tomllib (py311+) or an installed tomli"
    )

REPO = pathlib.Path(__file__).resolve().parent.parent


def _project():
    with open(REPO / "pyproject.toml", "rb") as f:
        return tomllib.load(f)


def test_console_scripts_resolve():
    scripts = _project()["project"]["scripts"]
    assert len(scripts) >= 14
    for name, target in scripts.items():
        mod, fn = target.split(":")
        obj = getattr(importlib.import_module(mod), fn, None)
        assert callable(obj), f"{name} -> {target} is not callable"


def test_package_data_globs_match_files():
    data = _project()["tool"]["setuptools"]["package-data"]
    for pkg, patterns in data.items():
        pkg_dir = REPO / pkg.replace(".", "/")
        for pattern in patterns:
            assert glob.glob(str(pkg_dir / pattern)), f"{pkg}/{pattern} matches nothing"


def test_dependencies_are_importable():
    # Every declared core dependency must be present in this image — the
    # dependency list documents what the code actually imports.
    import_name = {
        "orbax-checkpoint": "orbax.checkpoint",
        "protobuf": "google.protobuf",
        "msgpack": "msgpack",
        "typing_extensions": "typing_extensions",
    }
    for dep in _project()["project"]["dependencies"]:
        name = dep.split(">=")[0].split("==")[0].strip()
        importlib.import_module(import_name.get(name, name))
