"""AST-level lint gate: no shadowed definitions, no silently
overwritten registry keys.

Two prior rounds shipped exactly these defects — round 8 a duplicate
top-level ``oov_rate`` def whose second copy shadowed the first, and a
registry key registered twice so one dict-literal entry silently won.
This test makes both structurally impossible: it parses (never imports)
every package module plus ``__spark_entry__.py`` and asserts

1. no module defines the same top-level function/class name twice, and
2. every string key contributed to ``_ALL_QUERIES`` / ``_ALL_SQL``
   (initial dict literal + every ``.update({...})`` call) appears
   exactly once across the file.

Pure-source analysis, so it runs in milliseconds with no SparkSession.
"""

from __future__ import annotations

import ast
from collections import Counter
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
PKG = REPO / "metadata_etl_framework_spark"

MODULES = sorted(PKG.rglob("*.py")) + [REPO / "__spark_entry__.py"]


@pytest.mark.parametrize(
    "path", MODULES, ids=[str(p.relative_to(REPO)) for p in MODULES]
)
def test_no_duplicate_top_level_defs(path: Path):
    tree = ast.parse(path.read_text(), filename=str(path))
    names = Counter(
        node.name
        for node in tree.body
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef))
    )
    dups = {n: c for n, c in names.items() if c > 1}
    assert not dups, f"{path}: shadowed top-level defs {dups}"


def _registry_keys(tree: ast.Module, registry: str) -> Counter:
    """Every literal string key contributed to ``registry`` — from its
    initial ``{...}`` assignment and every ``registry.update({...})``."""
    keys: Counter = Counter()

    def keys_of(d: ast.AST):
        if isinstance(d, ast.Dict):
            for k in d.keys:
                if isinstance(k, ast.Constant) and isinstance(k.value, str):
                    keys[k.value] += 1

    for node in ast.walk(tree):
        if isinstance(node, (ast.Assign, ast.AnnAssign)):
            targets = (
                node.targets if isinstance(node, ast.Assign) else [node.target]
            )
            if any(
                isinstance(t, ast.Name) and t.id == registry for t in targets
            ) and node.value is not None:
                keys_of(node.value)
        elif (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr == "update"
            and isinstance(node.func.value, ast.Name)
            and node.func.value.id == registry
        ):
            for arg in node.args:
                keys_of(arg)
    return keys


@pytest.mark.parametrize("registry", ["_ALL_QUERIES", "_ALL_SQL"])
def test_registry_keys_registered_exactly_once(registry: str):
    tree = ast.parse(
        (REPO / "__spark_entry__.py").read_text(),
        filename="__spark_entry__.py",
    )
    keys = _registry_keys(tree, registry)
    assert keys, f"no literal keys found for {registry} — lint is blind"
    dups = {k: c for k, c in keys.items() if c > 1}
    assert not dups, f"{registry} keys registered more than once: {dups}"


def test_driver_and_extra_key_lists_have_no_literal_duplicates():
    """The _DRIVER_KEYS/_EXTRA_KEYS list literals themselves: a key pasted
    twice would silently shrink the 50-entry gate at runtime."""
    tree = ast.parse(
        (REPO / "__spark_entry__.py").read_text(),
        filename="__spark_entry__.py",
    )
    for name in ("_DRIVER_KEYS", "_EXTRA_KEYS"):
        lists = [
            node.value
            for node in ast.walk(tree)
            if isinstance(node, ast.Assign)
            and any(
                isinstance(t, ast.Name) and t.id == name for t in node.targets
            )
        ]
        assert len(lists) == 1, f"{name} assigned {len(lists)} times"
        (lst,) = lists
        assert isinstance(lst, ast.List)
        vals = [
            e.value
            for e in lst.elts
            if isinstance(e, ast.Constant) and isinstance(e.value, str)
        ]
        dup = {k: c for k, c in Counter(vals).items() if c > 1}
        assert not dup, f"{name} literal duplicates: {dup}"
