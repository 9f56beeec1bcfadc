"""Boundary constraints B(x) = (P(x) - I(x)) / Z(x) per asserted register.

Mirrors /root/reference/lib/components/BoundaryConstraints.ts: I interpolates
the asserted (x_step, value) points, Z = prod (x - x_step); the batch path
evaluates I and Z over the whole evaluation domain via LDE, the point path
evaluates the small polynomials directly.  Register order is first-appearance
order of assertions (JS Map insertion order).
"""

from __future__ import annotations

from typing import Dict, List

import jax.numpy as jnp

from .. import ntt


class BoundaryConstraints:
    def __init__(self, assertions, context):
        self.field = context.field
        f = self.field.host
        ext = context.extension_factor
        r_data: Dict[int, dict] = {}
        for a in assertions:
            x = f.exp(context.root_of_unity, a.step * ext)
            z_factor = [f.neg(x), 1]
            data = r_data.get(a.register)
            if data:
                data["xs"].append(x)
                data["ys"].append(a.value % self.field.modulus)
                data["z_poly"] = f.mul_polys(data["z_poly"], z_factor)
            else:
                r_data[a.register] = {"xs": [x], "ys": [a.value % self.field.modulus],
                                      "z_poly": z_factor}
        self.polys = {}
        for register, data in r_data.items():
            i_poly = f.interpolate(data["xs"], data["ys"])
            self.polys[register] = {"i_poly": i_poly, "z_poly": data["z_poly"],
                                    "xs": data["xs"]}

    @property
    def count(self) -> int:
        return len(self.polys)

    def evaluate_at(self, p_values: List[int], x: int,
                    z_invs: List[int] = None) -> List[int]:
        """z_invs: optional precomputed Z_b(x)^-1 per register (insertion
        order) — the verifier batches these across query positions."""
        f = self.field.host
        out = []
        for b, (register, c) in enumerate(self.polys.items()):
            i = f.eval_poly_at(c["i_poly"], x)
            p = p_values[register]
            if z_invs is not None:
                out.append(f.mul(f.sub(p, i), z_invs[b]))
            else:
                z = f.eval_poly_at(c["z_poly"], x)
                out.append(f.div(f.sub(p, i), z))
        return out

    def z_dens_at(self, x: int) -> List[int]:
        """Z_b(x) denominators per register (insertion order), for batched
        inversion by the verifier."""
        f = self.field.host
        return [f.eval_poly_at(c["z_poly"], x) for c in self.polys.values()]

    def i_polys_std(self) -> "np.ndarray":
        """Interpolant coefficients as standard-form limb arrays [B, L, T_pad]
        (zero-padded), for passing as a traced argument to the fused prover —
        assertion VALUES stay out of the compiled program so it is reusable
        across inputs.  T_pad = max interpolant length."""
        import numpy as np
        from ..field.limbs import ints_to_limbs
        field = self.field
        L = field.device.L
        t_pad = max(len(c["i_poly"]) for c in self.polys.values())
        out = np.zeros((self.count, L, t_pad), dtype=np.uint32)
        for b, (register, c) in enumerate(self.polys.items()):
            ints = [v % field.modulus for v in c["i_poly"]]
            out[b, :, :len(ints)] = ints_to_limbs(ints, L)
        return out

    def evaluate_all(self, p_polys: jnp.ndarray, domain_size: int,
                     i_polys_mont=None, tables=None) -> List[jnp.ndarray]:
        """p_polys: [R, L, T] trace polynomials in coefficient form
        (Montgomery).  Returns a list of [L, Ne] B(x) vectors in register
        insertion order.

        TPU-native derivation: B = (P - I) / Z is computed as an *exact*
        polynomial quotient (synthetic division by each linear factor of Z,
        vectorized as suffix-scans) and then LDE'd once — instead of the
        reference's pointwise division with a full-domain batch inversion
        (BoundaryConstraints.ts:71-95).  Pointwise, both agree at every
        non-trace domain position (all positions the protocol ever samples);
        committing the exact quotient keeps L(x) genuinely low-degree.
        """
        field = self.field
        f = field.host
        dev = field.device
        out = []
        for b, (register, c) in enumerate(self.polys.items()):
            coeffs = p_polys[register]                         # [L, T]
            T = coeffs.shape[-1]
            if i_polys_mont is not None:
                i_dev = jnp.pad(i_polys_mont[b],
                                [(0, 0), (0, T - i_polys_mont.shape[-1])])
            else:
                i_ints = [v % field.modulus for v in c["i_poly"]]
                i_dev = dev.from_ints(i_ints + [0] * (T - len(i_ints)))
            n_coeffs = dev.sub(coeffs, i_dev)
            for j, root in enumerate(c["xs"]):
                powers = tables["bdiv"][b][j] if tables is not None else None
                n_coeffs = _synthetic_divide(field, n_coeffs, root, powers)
            if tables is not None:
                from .composition import _transform
                padded = jnp.pad(n_coeffs,
                                 [(0, 0), (0, domain_size - n_coeffs.shape[-1])])
                ne_mxu = tables.get("ne_fwd_mxu")
                out.append(_transform(field, padded, domain_size,
                                      None if ne_mxu is not None else
                                      tables["ne_fwd_w"],
                                      tables.get("ne_fwd_panel"), ne_mxu))
            else:
                out.append(ntt.low_degree_extend(field, n_coeffs, domain_size))
        return out


def _synthetic_divide(field, a: jnp.ndarray, c: int, powers=None) -> jnp.ndarray:
    """Exact division of polynomial a (coeff form, [L, T] Montgomery) by the
    linear factor (x - c), keeping the [L, T] shape (quotient degree is one
    lower, so the top coefficient comes out zero).

    Closed form b_k = sum_{j>k} a_j c^(j-k-1), computed as
    b_k = cinv^(k+1) * suffix_sum_{j>k}(a_j c^j) — log2(T) vector adds plus
    two power-series multiplies, instead of a sequential Horner recurrence
    (which would serialize on TPU).  `powers` optionally supplies the
    (c-powers, c^-1-powers) tables as traced parameters (fused prover).
    """
    f = field.host
    dev = field.device
    T = a.shape[-1]
    if powers is not None:
        powers_c, powers_cinv = powers
    else:
        powers_c = dev.power_series(c, T)                      # [L, T]
        powers_cinv = dev.power_series(f.inv(c), T)
    u = dev.mul(a, powers_c)                                   # u_j = a_j c^j
    # inclusive suffix sums via log-doubling, then shift to exclusive
    s = u
    k = 1
    while k < T:
        shifted = jnp.pad(s[:, k:], [(0, 0), (0, k)])
        s = dev.add(s, shifted)
        k *= 2
    s_excl = jnp.pad(s[:, 1:], [(0, 0), (0, 1)])               # S_k = sum_{j>k}
    b = dev.mul(dev.mul(s_excl, powers_cinv),
                dev.const(f.inv(c), shape=(1,)))
    return b
