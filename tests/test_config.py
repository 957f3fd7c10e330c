"""Config/flag registry tests."""

import pytest

from toyrenderer_tpu import config as C


@pytest.fixture(autouse=True)
def clean_registry():
    saved = dict(C._REGISTRY)
    C._REGISTRY.clear()
    yield
    C._REGISTRY.clear()
    C._REGISTRY.update(saved)


def test_register_and_parse():
    width = C.option("testwidth", 1920, "render width")
    debug = C.option("testdebug", False, "debug toggle")
    scale = C.option("testscale", 1.5)
    ns = C.parse_args(["--testwidth", "640", "--testdebug"])
    assert width.get() == 640
    assert debug.get() is True
    assert scale.get() == 1.5
    assert ns.testwidth == 640


def test_idempotent_registration():
    a = C.option("dup", 3)
    b = C.option("dup", 3)
    assert a is b
    with pytest.raises(ValueError):
        C.Option("dup", 4)


def test_unknown_args_ignored():
    C.option("known", "x")
    ns = C.parse_args(["--known", "y", "--unknownflag", "z"])
    assert ns.known == "y"
