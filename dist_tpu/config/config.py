"""Hierarchical YAML config system.

API-compatible rebuild of the reference config layer
(``utils/config.py:16-265`` in the reference): a run is configured by a YAML
file that may inherit from other YAML files through three keys

- ``_BASE``: single-parent inheritance chain,
- ``_BASE_RUN`` / ``_BASE_MODEL``: dual-parent inheritance (training schedule
  vs. model architecture),

merged depth-first with child-wins deep-merge semantics
(``utils/config.py:154-175``), seeded from ``configs/pool/base.yaml`` (the
full default key schema), and finally overridden from the command line with
dotted ``KEY.SUB.KEY value`` pairs validated against existing keys
(``utils/config.py:177-232``).

Differences from the reference (intentional fixes, not omissions):

- base-file paths resolve relative to the *including file's directory*
  (the reference's ad-hoc ``'..'``-counting string surgery at
  ``utils/config.py:115-150`` is replaced by ``os.path`` resolution with
  identical outcomes for every config shipped in the reference),
- CLI override values are parsed with YAML semantics at any depth (the
  reference stores raw strings for depth>=2 keys, ``utils/config.py:226-230``),
- the quirky ``"1e-"`` string->float coercion (``utils/config.py:246-247``)
  is preserved for compatibility with hand-written exponent literals.
"""

import argparse
import copy
import json
import os

import yaml

_BASE_KEYS = ("_BASE", "_BASE_RUN", "_BASE_MODEL")


def _coerce(value):
    """Preserve the reference's string->float coercion for '1e-5'-style values
    (utils/config.py:246-247)."""
    if isinstance(value, str) and value[1:3] == "e-":
        try:
            return float(value)
        except ValueError:
            return value
    return value


class Config:
    """Attribute-style view over a nested dict of config values.

    ``cfg.TRAIN.BATCH_SIZE`` mirrors the reference's access pattern; every
    builder in the framework takes a ``cfg`` node.
    """

    def __init__(self, cfg_dict=None, level="cfg"):
        object.__setattr__(self, "_level", level)
        object.__setattr__(self, "cfg_dict", cfg_dict or {})
        for k, v in (cfg_dict or {}).items():
            if isinstance(v, dict):
                object.__setattr__(self, k, Config(v, level=f"{level}.{k}"))
            else:
                object.__setattr__(self, k, _coerce(v))

    # -- mutation keeps the backing dict in sync so dump() stays truthful --
    def __setattr__(self, key, value):
        if key in ("_level", "cfg_dict", "args"):
            object.__setattr__(self, key, value)
            return
        if isinstance(value, dict):
            value = Config(value, level=f"{self._level}.{key}")
        if isinstance(value, Config):
            self.cfg_dict[key] = value.cfg_dict
        else:
            self.cfg_dict[key] = value
        object.__setattr__(self, key, value)

    def get(self, key, default=None):
        return getattr(self, key, default)

    def __contains__(self, key):
        return key in self.cfg_dict

    def __repr__(self):
        return f"{self.dump()}\n"

    def dump(self):
        return json.dumps(self.cfg_dict, indent=2, default=str)

    def deep_copy(self):
        return Config(copy.deepcopy(self.cfg_dict), level=self._level)

    def to_dict(self):
        return copy.deepcopy(self.cfg_dict)


# --------------------------------------------------------------------------
# loading


def _deep_merge(base, new, preserve_base=False):
    """Child-wins deep merge (reference utils/config.py:154-175).

    ``preserve_base=True`` keeps ``_BASE*`` keys from the child so that a
    ``_BASE_RUN`` parent can itself be extended by a ``_BASE_MODEL`` merge.
    """
    for k, v in new.items():
        if k in base:
            if isinstance(v, dict) and isinstance(base[k], dict):
                _deep_merge(base[k], v)
            else:
                base[k] = v
        else:
            # skip only the exact reserved inheritance keys. The reference
            # drops ANY new key containing "BASE" (utils/config.py:173), so
            # e.g. a child's OPTIMIZER.BASE_LR silently vanishes when its
            # parent doesn't already define it — fixed here.
            if k not in _BASE_KEYS or preserve_base:
                base[k] = v
    return base


def _resolve(path, current_file):
    """Resolve a base-file reference relative to the including file."""
    if os.path.isabs(path):
        return path
    here = os.path.dirname(os.path.abspath(current_file))
    if path.startswith("./"):
        return os.path.normpath(os.path.join(here, path[2:]))
    return os.path.normpath(os.path.join(here, path))


def _load_yaml_tree(path):
    """Load one YAML file and recursively fold in its ``_BASE*`` parents."""
    with open(path, "r") as f:
        cfg = yaml.safe_load(f.read()) or {}

    if not any(k in cfg for k in _BASE_KEYS):
        return cfg

    if "_BASE" in cfg:
        base = _load_yaml_tree(_resolve(cfg["_BASE"], path))
        cfg = _deep_merge(base, cfg)
    else:
        if "_BASE_RUN" in cfg:
            base = _load_yaml_tree(_resolve(cfg["_BASE_RUN"], path))
            cfg = _deep_merge(base, cfg, preserve_base=True)
        if "_BASE_MODEL" in cfg:
            base = _load_yaml_tree(_resolve(cfg["_BASE_MODEL"], path))
            cfg = _deep_merge(base, cfg)
    return cfg


def _find_base_schema(cfg_file):
    """Locate configs/pool/base.yaml: next to cwd (reference behavior,
    utils/config.py:86-92) or relative to the repo holding the cfg file."""
    candidates = ["./configs/pool/base.yaml"]
    d = os.path.dirname(os.path.abspath(cfg_file))
    for _ in range(6):
        candidates.append(os.path.join(d, "configs", "pool", "base.yaml"))
        d = os.path.dirname(d)
    for c in candidates:
        if os.path.exists(c):
            return c
    raise FileNotFoundError(
        "configs/pool/base.yaml not found (looked in cwd and above the cfg file)"
    )


def _parse_opt_value(raw, old_value):
    """Parse a CLI override value with YAML typing, falling back to the old
    value's type for depth-1 keys the way the reference does
    (utils/config.py:223-224)."""
    try:
        val = yaml.safe_load(raw)
    except yaml.YAMLError:
        val = raw
    if old_value is not None and not isinstance(val, type(old_value)):
        # e.g. int literal overriding a float key
        if isinstance(old_value, float) and isinstance(val, int):
            val = float(val)
    return val


def merge_opts(cfg_dict, opts):
    """Apply ``KEY.SUB.KEY value`` CLI overrides (depth <= 4, keys must
    pre-exist: reference utils/config.py:177-232)."""
    assert len(opts) % 2 == 0, (
        f"Override list {opts} has odd length: {len(opts)}."
    )
    for key, raw in zip(opts[0::2], opts[1::2]):
        parts = key.split(".")
        assert len(parts) <= 4, (
            f"Key depth error. Maximum depth: 4. Got: {key}"
        )
        node = cfg_dict
        for p in parts[:-1]:
            assert isinstance(node, dict) and p in node, f"Non-existent key: {key}."
            node = node[p]
        assert isinstance(node, dict) and parts[-1] in node, f"Non-existent key: {key}."
        node[parts[-1]] = _parse_opt_value(raw, node[parts[-1]])
    return cfg_dict


def load_config(cfg_file, opts=(), init_method=None, make_output_dir=True):
    """Build the full Config: base schema -> yaml hierarchy -> CLI opts."""
    schema = _load_yaml_tree(_find_base_schema(cfg_file))
    tree = _load_yaml_tree(cfg_file)
    cfg_dict = _deep_merge(schema, tree)
    cfg_dict = merge_opts(cfg_dict, list(opts))
    cfg = Config(cfg_dict)
    cfg.args = argparse.Namespace(
        cfg_file=cfg_file, init_method=init_method, opts=list(opts)
    )
    if make_output_dir and cfg.get("OUTPUT_DIR"):
        os.makedirs(os.path.join(cfg.OUTPUT_DIR, "checkpoints"), exist_ok=True)
    return cfg


def parse_args(argv=None):
    """The reference CLI contract (utils/config.py:42-67): ``--cfg`` +
    ``--init_method`` + remainder KEY VALUE pairs."""
    parser = argparse.ArgumentParser(description="dist_tpu config")
    parser.add_argument("--cfg", dest="cfg_file", default=None,
                        help="Path to the configuration file")
    parser.add_argument("--init_method", default=None, type=str,
                        help="kept for CLI compatibility; unused on TPU "
                             "(mesh construction replaces rendezvous)")
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    return parser.parse_args(argv)


def load_from_args(argv=None):
    args = parse_args(argv)
    assert args.cfg_file is not None, "--cfg is required"
    return load_config(args.cfg_file, args.opts or [], args.init_method)
