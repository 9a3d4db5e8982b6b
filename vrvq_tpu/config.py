"""YAML configuration system with ``$include`` composition and scope prefixes.

Re-provides the capabilities the reference gets from ``argbind``
(reference: scripts/train.py:42-62, conf/vrvq/vrvq_a2.yml:1-4):

  * YAML files compose via an ``$include`` list — included files are loaded
    first (in order) and the including file's own keys win on conflict.
  * Keys are dotted "binding" names: ``DAC_VRVQ.n_codebooks: 8`` collects
    into the kwargs for the ``DAC_VRVQ`` constructor.
  * Scope prefixes: ``train/AudioDataset.duration`` overrides
    ``AudioDataset.duration`` when the ``train`` scope is active
    (reference: scripts/train.py:184-207 ``argbind.scope``).
  * CLI: ``--args.load conf/x.yml`` plus ``--key value`` dotted overrides
    (reference: scripts/script_train.sh:24).
"""

from __future__ import annotations

import ast
import copy
from pathlib import Path
from typing import Any, Dict, Iterable, List, Optional, Sequence

import yaml


def _flatten(d: Dict[str, Any], parent: str = "") -> Dict[str, Any]:
    """Flatten one level of nesting for plain-dict YAML values.

    Dotted keys are kept verbatim; nested dicts under a non-dotted,
    non-scoped key are preserved as values (e.g. ``lambdas:`` stays a dict,
    matching the reference's ``lambdas`` mapping in conf/base.yml).
    """
    return dict(d)


class Config:
    """A flat mapping of dotted config keys with scope-aware lookup."""

    def __init__(self, values: Optional[Dict[str, Any]] = None):
        self._values: Dict[str, Any] = dict(values or {})
        self._scopes: List[str] = []

    # ------------------------------------------------------------- loading
    @classmethod
    def load(
        cls,
        path: str | Path,
        overrides: Optional[Dict[str, Any]] = None,
        base_dir: str | Path | None = None,
    ) -> "Config":
        """Load a YAML file, resolving ``$include`` recursively.

        ``$include`` paths are resolved relative to ``base_dir`` if given,
        else relative to the current working directory (matching the
        reference's ``conf/...`` relative includes), falling back to the
        including file's directory.
        """
        p = Path(path)
        if not p.exists() and base_dir is not None and not p.is_absolute():
            p = Path(base_dir) / p  # allow repo-relative paths from any cwd
        values = cls._load_file(p, base_dir)
        if overrides:
            values.update(overrides)
        return cls(values)

    @staticmethod
    def _load_file(path: Path, base_dir: str | Path | None) -> Dict[str, Any]:
        with open(path) as f:
            raw = yaml.safe_load(f) or {}
        if not isinstance(raw, dict):
            raise ValueError(f"Config file {path} must be a mapping")

        includes = raw.pop("$include", []) or []
        merged: Dict[str, Any] = {}
        for inc in includes:
            inc_path = Path(inc)
            candidates = []
            if base_dir is not None:
                candidates.append(Path(base_dir) / inc_path)
            candidates.append(inc_path)
            # reference configs use repo-root-relative includes
            # (conf/vrvq/vrvq_a2.yml includes "conf/base.yml"); search every
            # ancestor of the including file so loading works from any cwd
            for ancestor in path.resolve().parents:
                candidates.append(ancestor / inc_path)
            for cand in candidates:
                if cand.exists():
                    merged.update(Config._load_file(cand, base_dir))
                    break
            else:
                raise FileNotFoundError(f"$include {inc} (from {path}) not found")
        merged.update(_flatten(raw))
        return merged

    # -------------------------------------------------------------- access
    def __getitem__(self, key: str) -> Any:
        for scope in reversed(self._scopes):
            scoped = f"{scope}/{key}"
            if scoped in self._values:
                return self._values[scoped]
        return self._values[key]

    def get(self, key: str, default: Any = None) -> Any:
        try:
            return self[key]
        except KeyError:
            return default

    def __contains__(self, key: str) -> bool:
        return self.get(key, _MISSING) is not _MISSING

    def __setitem__(self, key: str, value: Any) -> None:
        self._values[key] = value

    def update(self, other: Dict[str, Any]) -> None:
        self._values.update(other)

    def kwargs(self, prefix: str) -> Dict[str, Any]:
        """Collect ``{prefix}.{name}`` keys into a kwargs dict.

        Scoped keys (``{scope}/{prefix}.{name}``) win over unscoped for every
        active scope, innermost scope last (reference: argbind scope
        semantics, scripts/train.py:184-207).
        """
        out: Dict[str, Any] = {}
        want = prefix + "."
        for key, value in self._values.items():
            if key.startswith(want):
                out[key[len(want):]] = value
        for scope in self._scopes:
            swant = f"{scope}/{prefix}."
            for key, value in self._values.items():
                if key.startswith(swant):
                    out[key[len(swant):]] = value
        return copy.deepcopy(out)

    # -------------------------------------------------------------- scopes
    def scope(self, name: str) -> "_ScopeCtx":
        return _ScopeCtx(self, name)

    @property
    def active_scopes(self) -> Sequence[str]:
        return tuple(self._scopes)

    def to_dict(self) -> Dict[str, Any]:
        return dict(self._values)


class _MISSINGTYPE:
    pass


_MISSING = _MISSINGTYPE()


class _ScopeCtx:
    def __init__(self, cfg: Config, name: str):
        self.cfg = cfg
        self.name = name

    def __enter__(self) -> Config:
        self.cfg._scopes.append(self.name)
        return self.cfg

    def __exit__(self, *exc) -> None:
        self.cfg._scopes.pop()


def _parse_cli_value(text: str) -> Any:
    """Parse a CLI override value: python literal if possible, else str."""
    try:
        return ast.literal_eval(text)
    except (ValueError, SyntaxError):
        lowered = text.lower()
        if lowered in ("true", "false"):
            return lowered == "true"
        if lowered in ("null", "none"):
            return None
        return text


def parse_args(
    argv: Optional[Iterable[str]] = None,
    base_dir: str | Path | None = None,
) -> Config:
    """Parse ``--args.load conf.yml`` + dotted ``--key value`` CLI overrides.

    Mirrors the reference launch convention
    (scripts/script_train.sh:24: ``--args.load conf/$exp.yml``).
    """
    import sys

    argv = list(argv if argv is not None else sys.argv[1:])
    load_path = None
    overrides: Dict[str, Any] = {}
    i = 0
    while i < len(argv):
        arg = argv[i]
        if not arg.startswith("--"):
            raise ValueError(f"Unexpected positional argument: {arg}")
        key = arg[2:]
        if "=" in key:
            key, text = key.split("=", 1)
            value = _parse_cli_value(text)
            i += 1
        elif i + 1 < len(argv) and not argv[i + 1].startswith("--"):
            value = _parse_cli_value(argv[i + 1])
            i += 2
        else:
            value = True
            i += 1
        if key == "args.load":
            load_path = value
        else:
            overrides[key] = value

    if load_path is not None:
        return Config.load(load_path, overrides=overrides, base_dir=base_dir)
    return Config(overrides)
