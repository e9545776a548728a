"""Static gate for the transient-cache lifetime contract (ADVICE r9).

``tie_lifetime(out, cached)`` frees a ``transient_persist`` cache when the
tied frame is garbage-collected.  DERIVED frames (``out.select(...)``)
hold no Python reference to the tied one, so an in-repo caller that wraps
a tied producer's result and drops the original silently loses the
compute-once cache — correct results, quietly recomputed candidate
pipelines per consumer.  Round 9 had to patch four entry-point queries
for exactly this; this gate makes the review automatic.

The analysis is deliberately coarse (AST, no dataflow): a call site of a
tied producer is compliant when the enclosing function either

- returns the producer call directly (``return P(...)``) — the tie rides
  the returned frame;
- rebinds and returns the same name with no derivation in between; or
- calls ``carry_lifetime`` anywhere (it is then responsible for moving
  the ties onto whatever it returns).

Anything else — chaining ``P(...).select(...)``, deriving from the bound
name without a carry — fails with the offending file:line.  False
positives are resolved by routing the wrap through
``tuning.carry_lifetime`` (always safe: a src with no ties passes
through untouched).
"""

from __future__ import annotations

import ast
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: frame methods that CONSUME rather than derive — safe on a tied frame
#: while it is still referenced
_CONSUMERS = {
    "count", "collect", "toPandas", "write", "explain", "unpersist",
    "persist", "localCheckpoint", "checkpoint", "createOrReplaceTempView",
    "isStreaming", "printSchema", "first", "take", "foreach",
    "foreachPartition", "show",
}


def _source_files() -> list[str]:
    files = [os.path.join(REPO, "__spark_entry__.py")]
    pkg = os.path.join(REPO, "dataengineer_spark")
    for root, _, fns in os.walk(pkg):
        files += [os.path.join(root, f) for f in fns if f.endswith(".py")]
    return files


def _callee(call: ast.Call) -> str | None:
    f = call.func
    if isinstance(f, ast.Name):
        return f.id
    if isinstance(f, ast.Attribute):
        return f.attr
    return None


def _tied_producers(trees: dict[str, ast.AST]) -> set[str]:
    """Functions whose return value carries lifetime ties — i.e. whose
    body contains ``return tie_lifetime(...)`` / ``return
    carry_lifetime(...)``.  Derived automatically so new producers are
    gated the day they appear."""
    out: set[str] = set()
    for tree in trees.values():
        for node in ast.walk(tree):
            if not isinstance(node, ast.FunctionDef):
                continue
            for sub in ast.walk(node):
                if (
                    isinstance(sub, ast.Return)
                    and isinstance(sub.value, ast.Call)
                    and _callee(sub.value) in ("tie_lifetime", "carry_lifetime")
                ):
                    out.add(node.name)
    return out


def _violations_in(fn: ast.FunctionDef, producers: set[str], path: str):
    calls_carry = any(
        isinstance(s, ast.Call) and _callee(s) == "carry_lifetime"
        for s in ast.walk(fn)
    )
    if calls_carry:
        return []
    viol = []
    # names bound to a producer call in this function
    bound: set[str] = set()
    returned_direct: set[int] = set()  # id() of Call nodes returned directly
    for s in ast.walk(fn):
        if isinstance(s, ast.Return) and isinstance(s.value, ast.Call):
            returned_direct.add(id(s.value))
        if isinstance(s, ast.Assign) and isinstance(s.value, ast.Call):
            if _callee(s.value) in producers:
                for t in s.targets:
                    if isinstance(t, ast.Name):
                        bound.add(t.id)
    for s in ast.walk(fn):
        if isinstance(s, ast.Call) and _callee(s) in producers:
            # compliant: `return P(...)` — the tie rides the result
            if id(s) in returned_direct:
                continue
            # compliant: bound to a name (checked below for derivations)
            is_bound = any(
                isinstance(a, ast.Assign)
                and a.value is s
                for a in ast.walk(fn)
            )
            if not is_bound:
                viol.append(
                    f"{path}:{s.lineno} {fn.name}(): result of tied "
                    f"producer {_callee(s)}() is neither returned directly "
                    "nor bound — a chained derivation drops the cache tie; "
                    "bind it and wrap with carry_lifetime"
                )
    # derivations from bound names without carry
    for s in ast.walk(fn):
        if (
            isinstance(s, ast.Call)
            and isinstance(s.func, ast.Attribute)
            and isinstance(s.func.value, ast.Name)
            and s.func.value.id in bound
            and s.func.attr not in _CONSUMERS
        ):
            viol.append(
                f"{path}:{s.lineno} {fn.name}(): derives "
                f"{s.func.value.id}.{s.func.attr}(...) from a tied "
                "producer result without carry_lifetime — the transient "
                "cache unpersists at frame GC and the candidate pipeline "
                "recomputes per consumer"
            )
    return viol


def test_tied_producer_results_carry_their_lifetimes():
    trees = {}
    for f in _source_files():
        with open(f) as fh:
            trees[f] = ast.parse(fh.read())
    producers = _tied_producers(trees)
    # the contract's own implementation + the producers themselves are
    # exempt (they ARE the tie machinery)
    exempt = producers | {"tie_lifetime", "carry_lifetime"}
    violations: list[str] = []
    for path, tree in trees.items():
        if path.endswith("tuning.py"):
            continue
        rel = os.path.relpath(path, REPO)
        for node in ast.walk(tree):
            if isinstance(node, ast.FunctionDef) and node.name not in exempt:
                violations.extend(
                    _violations_in(node, producers, rel)
                )
    assert producers, "tied-producer discovery broke (found none)"
    assert not violations, "\n".join(violations)
