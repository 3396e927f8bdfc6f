"""Packaging sanity: the pyproject console scripts resolve, the native
sources ship inside the package, and the auto-build path points at them.
(The reference has no packaging at all — a user gets a loose script tree;
`pip install .` + entry points is deliberate beyond-reference surface.)"""

import importlib
import os
import tomllib

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def project():
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)["project"]


def test_console_scripts_resolve(project):
    scripts = project["scripts"]
    assert len(scripts) >= 5
    for name, target in scripts.items():
        mod, func = target.split(":")
        m = importlib.import_module(mod)
        assert callable(getattr(m, func)), f"{name} -> {target}"


def test_native_sources_inside_package():
    pkg_native = os.path.join(REPO, "ugaitnet_tpu", "native")
    assert os.path.exists(os.path.join(pkg_native, "gaitloader.cpp"))
    assert os.path.exists(os.path.join(pkg_native, "Makefile"))
    from ugaitnet_tpu.data import native
    # the ctypes binding must build from the in-package sources, not a
    # repo-root sibling that an installed copy wouldn't have
    assert os.path.abspath(native._NATIVE_DIR) == os.path.abspath(pkg_native)


def test_version_consistent(project):
    import ugaitnet_tpu
    assert project["version"] == ugaitnet_tpu.__version__
