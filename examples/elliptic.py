"""Elliptic-curve point multiplication STARK
(/root/reference/examples/elliptic/pointMul.ts + pointmul.aa): double-and-add
over secp224r1's base field (p = 2^224 - 2^96 + 1), 8 registers x 256 steps,
scalar fed LSB-first as a rank-2 bit input.

The independent oracle is plain affine secp224r1 arithmetic (a = -3); the
reference hard-codes the expected coordinates (pointMul.ts:30-33), which the
oracle reproduces.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Tuple

from genstark_tpu import instantiate
from genstark_tpu.field import P224
from genstark_tpu.protocol import Assertion

# On-disk reference source (optional): when absent, the framework's own
# generated equivalent (genstark_tpu/stdlib.pointmul_source) is used.
POINTMUL_AA = Path("/root/reference/examples/elliptic/pointmul.aa")

DEFAULT_OPTIONS = {                     # pointMul.ts:11-17
    "hash_algorithm": "blake2s256",
    "extension_factor": 16,
    "exe_query_count": 48,
    "fri_query_count": 24,
}

# pointMul.ts:24-33
G_X = 19277929113566293071110308034699488026831934219452440156649784352033
G_Y = 19926808758034470970197974370888749184205991990603949537637343198772
SCALAR = 21628546220445634706341881427918508772248629391536891476641575405363
EXPECTED = (5326626235735428056996404471396244610891648579045949976641038973984,
            6753729428472267765045584530315486521937702623726344079323769311058)

A = -3   # secp224r1 short-Weierstrass a


def ec_add(p1: Optional[Tuple[int, int]], p2: Optional[Tuple[int, int]],
           p: int = P224) -> Optional[Tuple[int, int]]:
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2 and (y1 + y2) % p == 0:
        return None
    if p1 == p2:
        slope = (3 * x1 * x1 + A) * pow(2 * y1, p - 2, p) % p
    else:
        slope = (y2 - y1) * pow(x2 - x1, p - 2, p) % p
    x3 = (slope * slope - x1 - x2) % p
    y3 = (slope * (x1 - x3) - y1) % p
    return (x3, y3)


def ec_mul(point: Tuple[int, int], scalar: int, p: int = P224):
    """Double-and-add (LSB first), the computation pointmul.aa proves."""
    result, addend = None, point
    while scalar:
        if scalar & 1:
            result = ec_add(result, addend, p)
        addend = ec_add(addend, addend, p)
        scalar >>= 1
    return result


def to_bits(value: int, length: int = 256) -> List[int]:
    """LSB-first 256-bit decomposition (pointMul.ts:65-68)."""
    return [(value >> i) & 1 for i in range(length)]


def make_pointmul_stark(options: Optional[dict] = None, logger=None,
                        use_reference_source: bool = False):
    if use_reference_source:
        src = POINTMUL_AA.read_text()
    else:
        from genstark_tpu.stdlib import pointmul_source
        src = pointmul_source()
    return instantiate(src, "default", options or dict(DEFAULT_OPTIONS), logger)


def run(options: Optional[dict] = None, logger=None):
    stark = make_pointmul_stark(options, logger)
    expected = ec_mul((G_X, G_Y), SCALAR)
    assert expected == EXPECTED          # oracle matches pointMul.ts:30-33
    inputs = [[G_X], [G_Y], [to_bits(SCALAR)]]
    assertions = [Assertion(step=255, register=2, value=expected[0]),
                  Assertion(step=255, register=3, value=expected[1])]
    proof = stark.prove(assertions, inputs)
    return stark, proof, assertions


if __name__ == "__main__":
    stark, proof, assertions = run()
    buf = stark.serialize(proof)
    assert len(buf) == stark.size_of(proof)
    assert stark.verify(assertions, stark.parse(buf))
    print(f"pointmul: proof {len(buf)} bytes, security {stark.security_level}")
