"""Numerics debugging: bad-gradient detection + NaN guards.

Capability parity with reference demonet/util/graph_utils.py:132-193
(`register_hooks`/`is_bad_grad` — walk the autograd graph and flag NaN or
|g| >= 1e6 gradients). The JAX equivalents:
  * `find_bad_gradients`  — compute grads and report every param path whose
    gradient is non-finite or exceeds a magnitude bound (the hook-based
    red-node dot graph becomes a path report — JAX grads are just a pytree).
  * `enable_nan_checks`   — jax_debug_nans: XLA re-runs the op that produced
    a NaN un-jitted and raises with its location (the runtime guard the
    reference approximates by aborting on non-finite loss, engine.py:41-44).
  * `tree_finite_report`  — quick health summary of any pytree.

Profiling (the reference's manual model_time/evaluator_time meters,
engine.py:90-100): use `jax.profiler.trace(logdir)` around steps and inspect
in TensorBoard/XProf; `annotate` below adds named trace spans.
"""

from __future__ import annotations

import contextlib
from typing import Any, Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def is_bad_grad(g: jnp.ndarray, magnitude: float = 1e6) -> bool:
    """NaN/Inf or huge gradient (reference graph_utils.py:155-158)."""
    arr = np.asarray(g)
    return bool(np.isnan(arr).any() or (np.abs(arr) >= magnitude).any())


def find_bad_gradients(
    loss_fn: Callable[..., jnp.ndarray],
    params: Any,
    *args: Any,
    magnitude: float = 1e6,
) -> List[Tuple[str, Dict[str, float]]]:
    """Return [(param_path, stats)] for every parameter with a bad gradient.

    The reference paints bad autograd nodes red in a graphviz dump
    (graph_utils.py:160-191); here the same information is a list of
    offending parameter paths with min/max/NaN counts.
    """
    grads = jax.grad(loss_fn)(params, *args)
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    bad = []
    for path, g in flat:
        arr = np.asarray(g)
        if np.isnan(arr).any() or (np.abs(arr) >= magnitude).any():
            bad.append((jax.tree_util.keystr(path), {
                "nan_count": int(np.isnan(arr).sum()),
                "max_abs": float(np.nanmax(np.abs(arr))) if arr.size else 0.0,
            }))
    return bad


def enable_nan_checks(enable: bool = True) -> None:
    """Global NaN tripwire (jax_debug_nans)."""
    jax.config.update("jax_debug_nans", enable)


def tree_finite_report(tree: Any) -> Dict[str, Any]:
    """Summary: total leaves, leaves with NaN/Inf, global max |x|."""
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    bad, max_abs = [], 0.0
    for path, x in leaves:
        arr = np.asarray(x)
        if arr.size == 0:
            continue
        if not np.isfinite(arr).all():
            bad.append(jax.tree_util.keystr(path))
        max_abs = max(max_abs, float(np.max(np.abs(arr))))
    return {"num_leaves": len(leaves), "non_finite_paths": bad,
            "max_abs": max_abs}


@contextlib.contextmanager
def annotate(name: str):
    """Named span in jax.profiler traces (TensorBoard/XProf)."""
    with jax.profiler.TraceAnnotation(name):
        yield


def jaxpr_to_dot(fn: Callable, *example_args: Any, max_nodes: int = 400) -> str:
    """Render a function's jaxpr as graphviz dot text.

    The compiler-graph visualization capability of the reference
    (graph_utils.visualize renders TVM Relay graphs, graph_utils.py:36-130);
    here the IR is the jaxpr. Feed the output to `dot -Tsvg`.
    """
    jaxpr = jax.make_jaxpr(fn)(*example_args)
    lines = ["digraph jaxpr {", "  rankdir=TB;",
             '  node [shape=box, fontsize=10];']
    produced = {}
    for i, var in enumerate(jaxpr.jaxpr.invars):
        name = f"in{i}"
        produced[str(var)] = name
        lines.append(f'  {name} [label="input {var.aval.str_short()}", '
                     'style=filled, fillcolor=lightblue];')
    for i, eqn in enumerate(jaxpr.jaxpr.eqns[:max_nodes]):
        node = f"op{i}"
        lines.append(f'  {node} [label="{eqn.primitive.name}"];')
        for invar in eqn.invars:
            src = produced.get(str(invar))
            if src is not None:
                lines.append(f"  {src} -> {node};")
        for outvar in eqn.outvars:
            produced[str(outvar)] = node
    if len(jaxpr.jaxpr.eqns) > max_nodes:
        lines.append(f'  truncated [label="... '
                     f'{len(jaxpr.jaxpr.eqns) - max_nodes} more ops"];')
    for i, var in enumerate(jaxpr.jaxpr.outvars):
        name = f"out{i}"
        lines.append(f'  {name} [label="output", style=filled, '
                     'fillcolor=lightgreen];')
        src = produced.get(str(var))
        if src is not None:
            lines.append(f"  {src} -> {name};")
    lines.append("}")
    return "\n".join(lines)


def dump_hlo(fn: Callable, *example_args: Any, stage: str = "stablehlo",
             path: str | None = None) -> str:
    """Dump the compiler IR of `fn` at a chosen stage.

    Completes the reference's compiler-graph visualization capability
    (graph_utils.visualize renders TVM Relay IR, graph_utils.py:36-130):
    here the compiler is XLA, so the stages are

      * "jaxpr"     — the traced jaxpr (jax's own IR, pre-lowering)
      * "stablehlo" — the lowered StableHLO module (what jax.export ships)
      * "optimized" — post-XLA-optimization HLO for the CURRENT backend:
                      fusions decided, layouts assigned — what actually runs

    Returns the text; also writes it to `path` when given. For a graphical
    view feed `jaxpr_to_dot` output to graphviz, or load an xprof trace.
    """
    if stage == "jaxpr":
        text = str(jax.make_jaxpr(fn)(*example_args))
    else:
        lowered = jax.jit(fn).lower(*example_args)
        if stage == "stablehlo":
            text = lowered.as_text()
        elif stage == "optimized":
            text = lowered.compile().as_text()
        else:
            raise ValueError(
                f"stage must be jaxpr|stablehlo|optimized, got {stage!r}")
    if path is not None:
        with open(path, "w") as f:
            f.write(text)
    return text
