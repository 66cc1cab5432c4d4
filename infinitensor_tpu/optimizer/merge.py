"""Horizontal multi-branch merge (the reference's ``searchMerge``).

The reference SearchEngine DFS-enumerates groupings of sibling compute ops
at the topological frontier and fuses groups its mutator accepts (two
matmuls -> one batched matmul, reference src/core/search_engine.cc:206-316
searchMerge/searchMergeDfs + src/core/dummy_mutator.cc:26-45
mergeMultiBranch). TPU-native recast: merge opportunities are found by
graph analysis (independent sibling ops of compatible shape), each group
can be applied independently, and the SearchEngine scores merged variants
against the original with its perf-cache cost model. The payoffs on TPU
are fewer kernel launches and larger MXU tiles — exactly the multi-branch
wins (Inception-style parallel branches) XLA will not restructure on its
own.

Merge kinds:
* shared_a_matmul — N matmuls reading the same activation against
  different weights: concat weights along the output dim -> one matmul ->
  split (the Megatron fused-QKV transform at graph scope).
* stacked_matmul  — N independent same-shape 2D matmuls: stack operands on
  a new leading batch dim -> one batched matmul -> split (reference
  DummyMutator::mergeMultiBranch semantics).
* sibling_conv    — N convs on the same input with identical attrs and
  kernel geometry: concat filters on the out-channel dim -> one conv ->
  split channels (Inception branch fusion).
"""

from __future__ import annotations

from typing import Optional

from infinitensor_tpu.core.graph import Graph
from infinitensor_tpu.core.operator import Operator
from infinitensor_tpu.core.tensor import TensorObj


def _ancestor_sets(graph: Graph) -> dict:
    """guid -> set of ancestor op guids (graph must be topo-sorted)."""
    anc: dict[int, set] = {}
    for op in graph.operators:
        s: set = set()
        for p in op.predecessors():
            s.add(p.guid)
            s |= anc.get(p.guid, set())
        anc[op.guid] = s
    return anc


def _independent(ops, anc) -> bool:
    guids = [o.guid for o in ops]
    return not any(
        a != b and a in anc.get(b, set())
        for a in guids for b in guids)


def _attr_key(attrs: dict) -> str:
    return repr(sorted((k, v) for k, v in attrs.items()))


def find_merge_groups(graph: Graph) -> list:
    """Enumerate horizontal merge opportunities: (kind, [op names])."""
    graph.require_sorted()
    anc = _ancestor_sets(graph)
    groups = []
    taken: set = set()

    # 1. matmuls sharing the same first input (plain, 2-input)
    by_a: dict[int, list] = {}
    for op in graph.operators:
        if (op.op_type == "MatMul" and len(op.inputs) == 2
                and not op.attrs.get("transA") and not op.attrs.get("transB")
                and len(op.inputs[1].shape) == 2):
            by_a.setdefault(op.inputs[0].guid, []).append(op)
    for ops in by_a.values():
        ops = [o for o in ops if o.guid not in taken]
        if len(ops) >= 2 and _independent(ops, anc):
            groups.append(("shared_a_matmul", [o.name for o in ops]))
            taken.update(o.guid for o in ops)

    # 2. independent same-shape 2D matmuls (distinct operands)
    by_shape: dict[tuple, list] = {}
    for op in graph.operators:
        if (op.op_type == "MatMul" and len(op.inputs) == 2
                and op.guid not in taken
                and len(op.inputs[0].shape) == 2
                and len(op.inputs[1].shape) == 2
                and not op.attrs.get("transA")
                and not op.attrs.get("transB")):
            key = (op.inputs[0].shape, op.inputs[1].shape)
            by_shape.setdefault(key, []).append(op)
    for ops in by_shape.values():
        if len(ops) >= 2 and _independent(ops, anc):
            groups.append(("stacked_matmul", [o.name for o in ops]))
            taken.update(o.guid for o in ops)

    # 3. sibling convs: same input, same attrs, same C/kh/kw
    by_conv: dict[tuple, list] = {}
    for op in graph.operators:
        if op.op_type == "Conv" and len(op.inputs) == 2 \
                and op.attrs.get("group", 1) == 1:
            key = (op.inputs[0].guid, _attr_key(op.attrs),
                   tuple(op.inputs[1].shape[1:]))
            by_conv.setdefault(key, []).append(op)
    for ops in by_conv.values():
        if len(ops) >= 2 and _independent(ops, anc):
            groups.append(("sibling_conv", [o.name for o in ops]))
    return groups


def apply_merges(graph: Graph, groups) -> Optional[Graph]:
    """Clone `graph` and apply each (kind, op-names) group. Returns the
    merged clone, or None if nothing applied."""
    g = graph.clone()
    changed = False
    for kind, names in groups:
        by_name = {op.name: op for op in g.operators}
        ops = [by_name[n] for n in names if n in by_name]
        if len(ops) < 2:
            continue
        if kind == "shared_a_matmul":
            changed |= _merge_shared_a(g, ops)
        elif kind == "stacked_matmul":
            changed |= _merge_stacked(g, ops)
        elif kind == "sibling_conv":
            changed |= _merge_conv(g, ops)
    if not changed:
        return None
    g.topo_sort()
    return g


def _add(g: Graph, op_type, ins, outs, attrs) -> Operator:
    return g.add_op(Operator(op_type, ins, outs, attrs))


def _merge_shared_a(g: Graph, ops) -> bool:
    a = ops[0].inputs[0]
    ws = [o.inputs[1] for o in ops]
    outs = [o.outputs[0] for o in ops]
    k = ws[0].shape[0]
    if any(w.shape[0] != k for w in ws):
        return False
    for o in ops:
        g.remove_op(o)
    nsum = sum(w.shape[1] for w in ws)
    wcat = TensorObj((k, nsum), ws[0].dtype)
    g.add_tensor(wcat)
    _add(g, "Concat", ws, [wcat], {"axis": 1})
    big = TensorObj(outs[0].shape[:-1] + (nsum,), outs[0].dtype)
    g.add_tensor(big)
    _add(g, "MatMul", [a, wcat], [big], {})
    _add(g, "Split", [big], outs,
         {"axis": -1, "split": [o.shape[-1] for o in outs]})
    return True


def _merge_stacked(g: Graph, ops) -> bool:
    n = len(ops)
    m, k = ops[0].inputs[0].shape
    kk, nn = ops[0].inputs[1].shape
    outs = [o.outputs[0] for o in ops]
    a3s, w3s = [], []
    for o in ops:
        a3 = TensorObj((1, m, k), o.inputs[0].dtype)
        w3 = TensorObj((1, kk, nn), o.inputs[1].dtype)
        g.add_tensor(a3)
        g.add_tensor(w3)
        _add(g, "Reshape", [o.inputs[0]], [a3], {"shape": [1, m, k]})
        _add(g, "Reshape", [o.inputs[1]], [w3], {"shape": [1, kk, nn]})
        a3s.append(a3)
        w3s.append(w3)
    for o in ops:
        g.remove_op(o)
    acat = TensorObj((n, m, k), a3s[0].dtype)
    wcat = TensorObj((n, kk, nn), w3s[0].dtype)
    big = TensorObj((n, m, nn), outs[0].dtype)
    for t in (acat, wcat, big):
        g.add_tensor(t)
    _add(g, "Concat", a3s, [acat], {"axis": 0})
    _add(g, "Concat", w3s, [wcat], {"axis": 0})
    _add(g, "MatMul", [acat, wcat], [big], {})
    slices = []
    for o in outs:
        s3 = TensorObj((1, m, nn), o.dtype)
        g.add_tensor(s3)
        slices.append(s3)
    _add(g, "Split", [big], slices, {"axis": 0, "split": [1] * n})
    for s3, o in zip(slices, outs):
        _add(g, "Reshape", [s3], [o], {"shape": [m, nn]})
    return True


def _merge_conv(g: Graph, ops) -> bool:
    x = ops[0].inputs[0]
    ws = [o.inputs[1] for o in ops]
    outs = [o.outputs[0] for o in ops]
    attrs = dict(ops[0].attrs)
    for o in ops:
        g.remove_op(o)
    fsum = sum(w.shape[0] for w in ws)
    wcat = TensorObj((fsum,) + tuple(ws[0].shape[1:]), ws[0].dtype)
    g.add_tensor(wcat)
    _add(g, "Concat", ws, [wcat], {"axis": 0})
    big = TensorObj((outs[0].shape[0], fsum) + tuple(outs[0].shape[2:]),
                    outs[0].dtype)
    g.add_tensor(big)
    _add(g, "Conv", [x, wcat], [big], attrs)
    _add(g, "Split", [big], outs,
         {"axis": 1, "split": [o.shape[1] for o in outs]})
    return True


def search_merge(graph: Graph, max_variants: int = 8) -> list:
    """Enumerate merged variants: each group on/off (reference
    searchMergeDfs mask enumeration, bounded). Variant 0 applies ALL
    groups; the rest toggle single groups for the cost model to compare."""
    groups = find_merge_groups(graph)
    if not groups:
        return []
    variants = []
    selections = [groups]                       # all-on first
    if len(groups) > 1:
        selections += [[grp] for grp in groups]  # each alone
    for sel in selections[:max_variants]:
        got = apply_merges(graph, sel)
        if got is not None:
            variants.append(got)
    return variants
