"""Conformance corpus stays byte-reproducible from the current writers.

The goldens under tests/goldens/ are the first-contact acceptance corpus for
external readers (see tests/goldens/FIRST_CONTACT.md). This test pins their
bytes: an intentional format change must regenerate the corpus
(``python tests/goldens/generate.py``) in the same commit, so the corpus can
never silently drift from what the writers actually produce.
"""

import os
import runpy

import pytest

HERE = os.path.join(os.path.dirname(__file__), "goldens")
FILES = ["tet_anim.abc", "tet_static.abc", "tet_anim.fbx", "tet_anim.glb",
         "tet_textured.glb"]


def test_goldens_reproducible(tmp_path, monkeypatch):
    committed = {}
    for f in FILES:
        path = os.path.join(HERE, f)
        if not os.path.exists(path):
            pytest.fail(f"missing golden {f}; run tests/goldens/generate.py")
        committed[f] = open(path, "rb").read()

    # regenerate into a scratch dir by patching the generator's HERE
    mod = runpy.run_path(os.path.join(HERE, "generate.py"),
                         run_name="not_main")
    monkeypatch.setitem(mod, "HERE", str(tmp_path))
    # run main() with HERE rebound
    import types
    fn = types.FunctionType(mod["main"].__code__, dict(mod, HERE=str(tmp_path)))
    fn()

    for f in FILES:
        fresh = open(os.path.join(str(tmp_path), f), "rb").read()
        assert fresh == committed[f], (
            f"{f} drifted from the committed golden — if the format change "
            "is intentional, regenerate tests/goldens/ in this commit")
