"""Nested-input semantics on a tiny AIR (fast enough for the default suite):
rank-2 childof inputs, peerof sharing, masks, shift -1 — the running-sum AIR
accumulates (parent + child) per step, re-initializing at parent boundaries
via the mask, exactly the lib128.aa structural pattern."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from genstark_tpu import instantiate
from genstark_tpu.air.assembly import compile_assembly
from genstark_tpu.air.module import compute_input_layout
from genstark_tpu.protocol import Assertion

TOY_AA = """
(module
    (field prime 4194304001)
    (export toy
        (registers 1) (constraints 1) (steps 4)
        (static
            (input secret (shift -1))                       # 0: parent value
            (input public (childof 0) (steps 4) (shift -1)) # 1: child values
            (mask (input 0))                                # 2: parent mask
            (mask (input 1)))                               # 3: child mask
        (init
            (add (get (load.static 0) 0) (get (load.static 0) 1)))
        (transition
            (add
                (mul
                    (add (get (load.static 0) 0) (get (load.static 0) 1))
                    (get (load.static 0) 3))
                (mul
                    (add (load.trace 0) (get (load.static 0) 1))
                    (sub (scalar 1) (get (load.static 0) 3)))))
        (evaluation
            (sub
                (load.trace 1)
                (add
                    (mul
                        (add (get (load.static 0) 0) (get (load.static 0) 1))
                        (get (load.static 0) 3))
                    (mul
                        (add (load.trace 0) (get (load.static 0) 1))
                        (sub (scalar 1) (get (load.static 0) 3))))))))
"""


def _oracle(p, parent, children):
    """children: list of lists (one per parent value); each child spans 4
    steps; shift -1 makes next values visible one step early."""
    # build expanded columns exactly per the layout rules
    n_children = len(children[0])
    span_child = 4
    span_parent = n_children * span_child
    T = len(parent) * span_parent
    col_parent = [parent[t // span_parent] for t in range(T)]
    flat_children = [c for group in children for c in group]
    col_child = [flat_children[t // span_child] for t in range(T)]
    # shift -1: col[t] = expanded[t+1] — next value visible one step early
    col_parent = col_parent[1:] + col_parent[:1]
    col_child = col_child[1:] + col_child[:1]
    # the mask aligns with the shifted column: it fires at the last step of
    # each span, where the transition computes the next cycle's init value
    mask_child = [1 if t % span_child == span_child - 1 else 0 for t in range(T)]
    state = (col_parent[0] + col_child[0]) % p
    rows = [state]
    for t in range(T - 1):
        if mask_child[t]:
            state = (col_parent[t] + col_child[t]) % p
        else:
            state = (state + col_child[t]) % p
        rows.append(state)
    return rows


def test_layout_computation():
    schema = compile_assembly(TOY_AA, "toy")
    T, spans, totals = compute_input_layout(schema, [[2], [2, 4]])
    assert T == 2 * 4 * 4
    assert spans[0] == 16 and spans[1] == 4
    assert totals[0] == 2 and totals[1] == 8


def test_toy_nested_end_to_end():
    schema = compile_assembly(TOY_AA, "toy")
    p = schema.field.modulus
    stark = instantiate(schema, options={"extension_factor": 8,
                                         "exe_query_count": 16,
                                         "fri_query_count": 8})
    parent = [100, 200]
    children = [[1, 2, 3, 9], [4, 5, 6, 10]]
    rows = _oracle(p, parent, children)
    T = len(rows)
    assertions = [Assertion(step=T - 1, register=0, value=rows[-1])]
    proof = stark.prove(assertions, [parent, children])
    assert proof.i_shapes == [[2], [2, 4]]
    assert stark.verify(assertions, stark.parse(stark.serialize(proof)),
                        public_inputs=[children])
    # tampered public input rejected
    with pytest.raises(Exception):
        stark.verify(assertions, proof, public_inputs=[[[1, 2, 3, 9], [4, 5, 6, 11]]])


def test_inconsistent_child_shapes_rejected():
    schema = compile_assembly(TOY_AA, "toy")
    stark = instantiate(schema)
    with pytest.raises(ValueError):
        stark.prove([Assertion(0, 0, 0)], [[1, 2], [[1, 2], [3]]])
