"""Console-script contract: pip's entry point runs ``sys.exit(main())``,
so value-returning mains (sample counts, FID floats, train states) must be
wrapped — otherwise every successful run exits non-zero / dumps the value
to stderr."""

import importlib
import tomllib

import psld_tpu  # noqa: F401  (registry import side effects not needed)

PYPROJECT = "/root/repo/pyproject.toml"

VALUE_RETURNING = {
    "psld-train-sde", "psld-train-clf", "psld-sample",
    "psld-class-cond-sample", "psld-inpaint", "psld-edit", "psld-fid",
    "psld-likelihood", "psld-sweep-fid-nfe",
}


def test_console_wrapper_swallows_return_value():
    from psld_tpu.cli._common import console

    assert console(lambda: 42)() is None
    assert console(lambda x=1: [x])() is None


def test_all_script_entries_resolve_and_value_mains_are_wrapped():
    with open(PYPROJECT, "rb") as f:
        scripts = tomllib.load(f)["project"]["scripts"]
    assert VALUE_RETURNING <= set(scripts)
    for name, target in scripts.items():
        mod, attr = target.split(":")
        fn = getattr(importlib.import_module(mod), attr)
        assert callable(fn), name
        if name in VALUE_RETURNING:
            # the console wrapper keeps the original main reachable
            assert getattr(fn, "__wrapped__", None) is not None, (
                f"{name} points at an unwrapped value-returning main")
