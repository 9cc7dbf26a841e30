import textwrap

from motion324_tpu.config import ConfigDict, load_config, parse_cli


def _write(tmp_path, text):
    p = tmp_path / "cfg.yaml"
    p.write_text(textwrap.dedent(text))
    return str(p)


def test_attribute_access_and_nesting(tmp_path):
    path = _write(tmp_path, """
        model:
          feat_dim: 768
          sub:
            x: [1, 2, 3]
    """)
    cfg = load_config(path)
    assert cfg.model.feat_dim == 768
    assert cfg.model.sub.x == [1, 2, 3]
    assert cfg["model"]["feat_dim"] == 768


def test_cli_overrides_types(tmp_path):
    path = _write(tmp_path, """
        training:
          lr: 1.0e-3
          use_amp: false
    """)
    cfg = load_config(path, ["training.lr=4e-4", "training.use_amp=true", "training.new_key=hello"])
    assert cfg.training.lr == 4e-4
    assert cfg.training.use_amp is True
    assert cfg.training.new_key == "hello"


def test_cli_whitespace_normalisation():
    ov = parse_cli(["a.b", "=", "3", "c=2"])
    assert ov == {"a.b": 3, "c": 2}


def test_interpolation(tmp_path):
    path = _write(tmp_path, """
        training:
          exp_name: run1
          checkpoint_dir: ./ckpt/${training.exp_name}
          steps: 10
          alias: ${training.steps}
    """)
    cfg = load_config(path)
    assert cfg.training.checkpoint_dir == "./ckpt/run1"
    assert cfg.training.alias == 10  # whole-string interp preserves type


def test_set_get_path():
    cfg = ConfigDict({})
    cfg.set_path("a.b.c", 5)
    assert cfg.a.b.c == 5
    assert cfg.get_path("a.b.c") == 5
    assert cfg.get_path("a.b.missing", "d") == "d"


def test_default_config_loads():
    cfg = load_config("configs/dyscene.yaml")
    assert cfg.model.feat_dim == 768
    assert cfg.training.frames == 12
    assert "test" in cfg.training.checkpoint_dir
