"""Config/flag system — same three-level precedence semantics as the reference
(CLI > experiment JSON > defaults.json): ``update_config`` (utils.py:42-84,
including the ``logical_op="OR"`` store_true-flag rule) and recursive
``fill_with_defaults`` (utils.py:193-201)."""

from __future__ import annotations


def dict2str(d) -> str:
    """Flatten a dict into an underscore-joined string (reference utils.py:13-25)."""
    out = []
    for k, v in d.items():
        out.append(str(k))
        if isinstance(v, (list, tuple)):
            v = "_".join(map(str, v))
        elif isinstance(v, float):
            v = f"{v:.0e}"
        elif isinstance(v, dict):
            v = dict2str(v)
        out.append(str(v))
    return "_".join(out)


def update_config(
    old_name,
    new_name=None,
    old_config=None,
    new_config=None,
    default=None,
    logical_op=None,
):
    """CLI-over-config precedence with getattr/getitem polymorphism.

    ``logical_op="OR"``: a False CLI store_true flag falls back to the config
    value; ``"AND"``: a True flag falls back (reference utils.py:69-79).
    """

    def safe_get(obj, name):
        if hasattr(obj, "__getitem__"):
            return obj.get(name, default)
        if hasattr(obj, "__getattribute__"):
            return getattr(obj, name, default)
        raise NotImplementedError(obj.__class__)

    def safe_set(obj, name, value):
        if hasattr(obj, "__setitem__"):
            obj[name] = value
        elif hasattr(obj, "__getattribute__"):
            setattr(obj, name, value)
        else:
            raise NotImplementedError(obj.__class__)

    if new_name is None:
        new_name = old_name

    try:
        param = safe_get(new_config, new_name)
        assert param is not None
        if isinstance(param, bool) and logical_op is not None:
            if logical_op == "OR":
                assert param
            elif logical_op == "AND":
                assert not param
            else:
                raise NotImplementedError(logical_op)
    except (KeyError, AttributeError, AssertionError):
        param = safe_get(old_config, old_name)

    safe_set(old_config, old_name, param)
    return param


def fill_with_defaults(config: dict, defaults: dict) -> None:
    """Recursive None-aware deep-merge of defaults into config (utils.py:193-201)."""
    for k, v in defaults.items():
        if isinstance(v, dict):
            if k not in config:
                config[k] = dict()
            fill_with_defaults(config[k], defaults[k])
        else:
            if k not in config or config[k] is None:
                config[k] = v
