import pytest

from dist_tpu.utils.registry import Registry


def test_register_and_get():
    reg = Registry("test")

    @reg.register()
    class Foo:
        pass

    assert reg.get("Foo") is Foo
    assert reg.get("Missing") is None
    with pytest.raises(KeyError):
        reg.get_strict("Missing")
    assert "Foo" in reg


def test_duplicate_rejected():
    reg = Registry("test")
    reg.register(name="x", obj=object())
    with pytest.raises(KeyError):
        reg.register(name="x", obj=object())
