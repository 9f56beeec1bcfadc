"""Single-program prover: the full pipeline (trace -> FRI remainder) as ONE
compiled XLA program with the Fiat-Shamir transcript derived on device.

Why: on the tunnelled-TPU backend every dispatch and every device<->host
sync is a full round-trip, and every distinct compiled program pays a large
one-time load cost.  The staged pipeline (protocol/stark.py) issues dozens
of dispatches and syncs per proof; this module compiles steps 3-7 of the
reference pipeline (/root/reference/lib/Stark.ts:81-163) into a single
program whose only traced inputs are the execution trace, the static
register columns and the boundary interpolants — so one program serves any
inputs/assertion-values for a given AIR + assertion structure — and whose
outputs stay device-resident except for a handful of 32-byte roots.

Host work after the single dispatch: Fiat-Shamir query sampling (rejection
sampling over sha256, inherently sequential and tiny), Merkle proof
scheduling (pure index bookkeeping), and THREE batched gathers (tree nodes,
spot-check values, remainder) to pull exactly the proof bytes.

The math is shared with the staged components (CompositionPolynomial,
BoundaryConstraints, ZeroPolynomial, fold_traced, build_tree_flat): the
staged path remains as `Stark.prove_staged` and the verifier recomputes the
same transcript on host, so any divergence fails the round-trip tests.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from .. import ntt
from ..field.limbs import ints_to_limbs, limbs_to_ints
from ..hash import Hash
from ..merkle import (_level_offset, assemble_batch, build_tree_flat,
                      plan_batch, tree_row_count)
from . import fiat_shamir as fs
from .composition import CompositionPolynomial
from .fri import (MAX_REMAINDER_LENGTH, LowDegreeProver, fold_traced,
                  get_augmented_positions)
from .lincomb import LinearCombination
from .proof import FriComponent, LowDegreeProof, StarkProof


class _LazyTables:
    """Name -> power-table view over the packed parameter (see
    FusedProver._build_table_specs).  Direct tables are static slices;
    factored tables are regenerated on device by one broadcast Montgomery
    multiply.  `parts(key)` exposes a factored table's (outer, inner)
    slices so chunked consumers can generate just the chunk they need."""

    def __init__(self, prover, tpack):
        self._prover = prover
        self._tpack = tpack
        self._layout = {}
        off = 0
        for spec in prover._table_specs:
            key, _, ln = spec[:3]
            # "panel" tables are not power series — always packed direct
            fac = None if len(spec) > 3 else prover._factored(ln)
            self._layout[key] = (off, ln, fac)
            off += ln if fac is None else fac[0] + fac[1]
        self._cache = {}

    def parts(self, key):
        """(outer, inner) slices of a factored table, or None if direct."""
        off, ln, fac = self._layout[key]
        if fac is None:
            return None
        s, nj = fac
        L = self._prover.field.device.L
        outer = jax.lax.slice(self._tpack, (0, off), (L, off + nj))
        inner = jax.lax.slice(self._tpack, (0, off + nj), (L, off + nj + s))
        return outer, inner

    def __contains__(self, key):
        return key in self._layout

    def get(self, key, default=None):
        return self[key] if key in self._layout else default

    def __getitem__(self, key):
        if key in self._cache:
            return self._cache[key]
        off, ln, fac = self._layout[key]
        dev = self._prover.field.device
        L = dev.L
        if fac is None:
            out = jax.lax.slice(self._tpack, (0, off), (L, off + ln))
        else:
            outer, inner = self.parts(key)
            out = dev.outer_table(outer, inner)
        self._cache[key] = out
        return out


def _mx_single(mx, key):
    """Single-chip MXU bundle for `key`, or None (mesh entries are tagged
    {"dist": (b1, b2)} and are NOT plug-compatible here — their scale is
    not folded and they describe the 4-step locals, not the whole size)."""
    b = mx.get(key) if mx else None
    return None if b is None or "dist" in b else b


def _mx_dist(mx, key):
    """(bundle_n1, bundle_n2) pair for the distributed 4-step locals of
    `key`, or None."""
    b = mx.get(key) if mx else None
    return b["dist"] if b is not None and "dist" in b else None


def _to_mont_batch(dev, arr_std: jnp.ndarray) -> jnp.ndarray:
    """[B, L, N] standard-form -> Montgomery (limb axis moved for dev ops)."""
    moved = jnp.moveaxis(arr_std, 1, 0)            # [L, B, N]
    return jnp.moveaxis(dev._to_mont(moved), 0, 1)


class FusedProver:
    """One instance per (Stark, proving-context shape, assertion structure).

    The compiled program depends on the AIR schema, trace length, options
    and assertion *positions* — NOT on input or assertion values, which
    enter as traced arguments.
    """

    def __init__(self, stark, context, assertions, mesh=None):
        self.stark = stark
        self.context = context
        self.field = context.field
        self.hash: Hash = stark.hash
        self.assertions = list(assertions)
        # Multi-chip mode: when a Mesh is configured the pipeline shards the
        # evaluation domain over it — explicit shard_map 4-step NTTs (one
        # all-to-all per transform over ICI) for every transform large
        # enough, and sharding constraints on all domain-major intermediates
        # so XLA partitions the elementwise/hash/fold stages and inserts the
        # halo (roll) and FRI stride-transpose collectives.  The math is
        # identical, so sharded proof bytes == single-device proof bytes
        # (asserted by tests/test_sharded_prover.py).
        self.mesh = mesh
        self.c_poly = CompositionPolynomial(assertions, None, context)
        self.l_comb = LinearCombination(None, self.c_poly.composition_degree,
                                        self.c_poly.coefficient_count, context)
        Ne = context.evaluation_domain_size
        self.Ne = Ne
        # FRI layer sizes: fold while the layer is longer than the remainder cap
        self.layer_sizes: List[int] = []
        n = Ne
        while n > MAX_REMAINDER_LENGTH:
            self.layer_sizes.append(n)
            n //= 4
        self.remainder_size = n
        self.secret_idx = list(context.schema.secret_input_registers)
        self._table_specs = self._build_table_specs()
        self._pack_cache = None       # device table pack, built on first prove
        self._mxund_cache = None      # MXU multi-level NTT bundles per key
        self._static_plan = None      # set by _statics_std (cyc/full order)
        # Large domains run as THREE stage programs (commit / composition /
        # FRI) instead of one: the single fused program's XLA temp footprint
        # at Ne = 2^24 is ~37 GB (HBM is 16), while stage boundaries let the
        # runtime actually free dead full-domain intermediates.  Small
        # domains keep the single program (fewest dispatches — each is a
        # ~30 ms round-trip on the tunnelled backend).
        import os
        # chunk size for cmap1 (see _helpers): elementwise Montgomery ops on
        # arrays longer than 2 chunks run chunk-at-a-time through lax.map
        self._chunk_elems = int(os.environ.get("GENSTARK_CHUNK_ELEMS", 1 << 21))
        # with Pallas tile kernels active, chunking is skipped entirely up to
        # this domain size (the kernels bound their own temps; the lax.map
        # wrapper costs real slice/update traffic, measured ~150 ms at
        # 2^24).  2^25 (the 2^21-step ladder top) fits: the fused lcomb-tail
        # kernel's live set there is its inputs/output (~5 GB) — the ~10
        # full-domain intermediates that used to force the map exist only in
        # the unfused fallback, which now re-chunks itself when the kernel
        # declines (see _lcomb_chunked).
        self._unchunk_ne = int(os.environ.get("GENSTARK_UNCHUNK_NE", 1 << 25))
        # Checkpoint trace upload: the tunnelled backend moves host->device
        # at ~40 MB/s, so the full u16 trace (16 MB at 2^20 steps) costs
        # ~0.4 s — the single largest item left in the proof after the
        # device stages were tuned.  Instead the host uploads every K-th
        # state ([R, L, n_seg], tens of KB) and stage A re-runs the
        # transition K-1 steps per segment, vectorized over the n_seg
        # lanes (one lax.scan; same IR evaluator the constraint stage
        # uses, so values are bit-identical).  GENSTARK_TRACE_SCAN=0/1
        # forces off/on (default: TPU only, trace >= 2^18 steps).
        v = os.environ.get("GENSTARK_TRACE_SCAN")
        T = context.trace_length
        scan_on = (v != "0" and self.mesh is None and T >= int(
            os.environ.get("GENSTARK_TRACE_SCAN_MIN", 1 << 18))
            and (v == "1" or jax.default_backend() == "tpu"))
        if scan_on:
            # clamp to the largest power-of-two divisor of T <= the request:
            # _scan_trace assumes n_seg * K == T exactly (statics reshape
            # [Kr, L, n_seg, K]); a non-divisor would crash mid-prove
            nseg = max(1, min(T // 2, int(os.environ.get(
                "GENSTARK_TRACE_SCAN_SEG", 8192))))
            while T % nseg:
                nseg -= 1
            self._trace_scan_nseg = nseg
        else:
            self._trace_scan_nseg = None
        # Split mode COMPOSES with mesh mode: the flagship multi-chip config
        # (2^20 steps -> Ne = 2^24 on a few chips) needs both the stage
        # boundaries (so dead full-domain intermediates are freed) and the
        # domain sharding; with D devices every full-domain buffer and temp
        # scales 1/D on top of the split-mode staging.  Host-origin inputs
        # (trace/statics/interpolants/table pack) enter replicated via
        # device_put in prove(); the domain sharding is established inside
        # the stages.  Byte-identity with the single-device single-program
        # path is pinned by tests/test_split_sharded.py.
        self._split = Ne >= int(os.environ.get("GENSTARK_SPLIT_NE", 1 << 22))
        # jits are created lazily so only the programs a given flow actually
        # dispatches ever compile (the host-sampled fallback pipeline, for
        # instance, compiles only if the device sampler ever disagrees)
        self._jit = None              # host-sampled full pipeline (fallback)
        self._jit_packed = None       # one-dispatch pipeline + packed tail
        self._jit_tail = None         # split-mode packed tail
        self._jit_stages = (
            self._export_cached("stage_commit", self._stage_commit),
            self._export_cached("stage_lcomb", self._stage_lcomb),
            self._export_cached("stage_fri", self._stage_fri)) \
            if self._split else None

        # Structure-level caps for the padded proof-extraction gather (the
        # actual per-proof counts vary slightly with Fiat-Shamir dedup, so
        # index arrays are padded to these caps -> fixed shapes -> exactly
        # one compiled gather program and ONE device->host transfer).
        exe_q = stark.index_generator.exe_query_count
        fri_q = stark.index_generator.fri_query_count
        all_layers = self.layer_sizes + [self.remainder_size]
        tree_sizes = [Ne] + [n // 4 for n in all_layers]
        pos_caps = [2 * exe_q, exe_q]                        # e-tree, lc tree
        for i in range(len(self.layer_sizes)):
            pos_caps += [fri_q, fri_q]                       # col, poly plans
        depths = [tree_sizes[0].bit_length() - 1, tree_sizes[1].bit_length() - 1]
        for i in range(len(self.layer_sizes)):
            depths += [tree_sizes[i + 2].bit_length() - 1,
                       tree_sizes[i + 1].bit_length() - 1]
        # e-tree rows and FRI-tree rows are gathered from separate buffers
        # (concatenating them into one tree buffer costs a full extra copy
        # of the largest array in the program — ~1.4 GB at Ne = 2^24)
        cap_rows_e = pos_caps[0] * (1 + depths[0])
        cap_rows_f = sum(p * (1 + d)
                         for p, d in zip(pos_caps[1:], depths[1:]))
        cap_cols = self.remainder_size + 4 * (exe_q + 2 * fri_q * len(self.layer_sizes))
        cap_evals = 2 * exe_q
        self._caps = (cap_rows_e, cap_rows_f, cap_cols, cap_evals)
        L = self.field.device.L
        V = context.schema.trace_width + len(self.secret_idx)

        def packed(e_flat, fri_cat, vals_cat, e_std, idx_re, idx_rf,
                   idx_cols, idx_e):
            # tree buffers are word-major [8, rows]; gather along lanes,
            # then transpose the tiny results so host unpack stays row-major
            rows_e = jnp.take(e_flat, idx_re, axis=1).T          # [capRe, 8]
            rows_f = jnp.take(fri_cat, idx_rf, axis=1).T         # [capRf, 8]
            cols = jnp.take(vals_cat, idx_cols, axis=1)          # [L, capC]
            evals = jnp.take(e_std, idx_e, axis=2)               # [V, L, capE]
            return jnp.concatenate([rows_e.reshape(-1), rows_f.reshape(-1),
                                    cols.reshape(-1), evals.reshape(-1)])

        self._packed_gather = jax.jit(packed)

    # --------------------------------------------------------------- tables
    def _build_table_specs(self):
        """Every power table the pipeline needs, as (key, seed, length).
        Tables are computed by host big-int arithmetic, packed into one
        [L, total] array uploaded once, and passed to the program as a
        PARAMETER — never baked into the executable as a literal (a single
        [L, Ne] table is a multi-MB dense constant otherwise, which blows up
        both XLA compile time and the executable shipped to the device)."""
        context = self.context
        f = self.field.host
        T = context.trace_length
        Ne = self.Ne
        Nc = context.composition_domain_size
        rou = context.root_of_unity
        specs = [
            ("w_T_inv", f.inv(f.get_root_of_unity(T)), max(1, T // 2)),
            ("w_Ne", f.get_root_of_unity(Ne), Ne // 2),
            ("w_Nc", f.get_root_of_unity(Nc), Nc // 2),
            ("w_Nc_inv", f.inv(f.get_root_of_unity(Nc)), Nc // 2),
            ("dom_fwd", rou, Ne),
        ]
        # 4-step twiddle panels T[k1, i2] = root^(k1*i2), flat [L, n]: when
        # a transform runs as the single-chip 4-step decomposition
        # (ntt._four_step_local) its panel is shipped as a direct pack
        # parameter so the program never rebuilds it (the in-program
        # build is a full-domain concat + gather per transform); capped at
        # 2^18 so the pack upload stays a few MB.
        from .. import ntt as _ntt
        for key, seed, size in (("w_T_inv", specs[0][1], T),
                                ("w_Ne", specs[1][1], Ne),
                                ("w_Nc", specs[2][1], Nc),
                                ("w_Nc_inv", specs[3][1], Nc)):
            if _ntt.mxu_applicable(self.field, size):
                continue              # MXU bundles replace the 4-step panel
            if (_ntt._use_pallas() and size <= (1 << 18)
                    and _ntt._four_step_local(size)):
                specs.append((f"p4_{key}", seed, size, "panel"))
        # per-depth FRI fold tables (w^(4^d))^i and inverse, i < N_d/4 — the
        # strided picks the folds need, WITHOUT ever holding full forward +
        # inverse domain tables (each [L, Ne] = 512 MB at Ne = 2^24)
        for d in range(len(self.layer_sizes)):
            g_d = f.exp(rou, 4 ** d)
            m_d = (Ne // (4 ** d)) // 4
            specs.append((f"fold{d}", g_d, m_d))
            specs.append((f"foldi{d}", f.inv(g_d), m_d))
        incr = self.c_poly.composition_degree - T
        if incr > 0:
            specs.append(("incr", f.exp(rou, incr), Ne))
        comp_rou = f.exp(rou, Ne // Nc)
        for gi, group in enumerate(self.c_poly.constraint_groups):
            if group["degree"] != self.c_poly.combination_degree:
                inc = self.c_poly.combination_degree - group["degree"]
                specs.append((f"adj{gi}", f.exp(comp_rou, inc), Nc))
        for b, (register, c) in enumerate(self.c_poly.b_poly.polys.items()):
            for j, root in enumerate(c["xs"]):
                specs.append((f"bc{b}_{j}", root, T))
                specs.append((f"bci{b}_{j}", f.inv(root), T))
        return specs

    # Tables longer than this are uploaded FACTORED — outer powers of
    # seed^s and inner powers of seed, len = nj*s with s ~ sqrt(len) — and
    # regenerated on device by one broadcast Montgomery multiply.  This
    # bounds both the host big-int work and the upload at O(sqrt(len)) per
    # table: the direct pack is ~2 GB at Ne = 2^24 (dom/incr/w_Ne tables are
    # all O(Ne)); the factored pack is a few hundred KB.
    _factor_threshold = 4096

    def _factored(self, ln: int):
        """(s, nj) split for a factored table, or None for direct upload."""
        if ln <= self._factor_threshold:
            return None
        s = 1 << ((ln.bit_length() - 1) // 2)
        return s, ln // s

    def _get_pack(self) -> jnp.ndarray:
        if self._pack_cache is None:
            from ..field.limbs import power_series_mont_np
            params = self.field.params
            p = self.field.modulus
            parts = []
            for spec in self._table_specs:
                _, seed, ln = spec[:3]
                if len(spec) > 3:            # 4-step twiddle panel
                    n1 = 1 << ((ln.bit_length() - 1) // 2)
                    n2 = ln // n1
                    series = power_series_mont_np(params, seed, ln)
                    idx = (np.arange(n1, dtype=np.int64)[:, None] *
                           np.arange(n2, dtype=np.int64)[None, :]).reshape(-1)
                    parts.append(np.ascontiguousarray(series[:, idx]))
                    continue
                fac = self._factored(ln)
                if fac is None:
                    parts.append(power_series_mont_np(params, seed, ln))
                else:
                    s, nj = fac
                    parts.append(power_series_mont_np(params,
                                                      pow(seed % p, s, p), nj))
                    parts.append(power_series_mont_np(params, seed, s))
            self._pack_cache = self._put(np.concatenate(parts, axis=1))
        return self._pack_cache

    def _get_mxund(self):
        """MXU multi-level NTT table bundles per transform key (device
        arrays, passed to the stage programs as PARAMETERS like the table
        pack).  Single-chip: one bundle per whole transform size, inverse
        keys fold their n^-1 scale into the level-1 digit matrix so the
        consuming stage skips its scaling pass.  Mesh mode: a
        {"dist": (bundle_n1, bundle_n2)} pair per key covering the 4-step
        LOCAL transforms inside shard_map (scale=1 — the external n^-1
        scaling stays, exactly as in the non-MXU dist path).  Empty dict
        wherever the MXU path is off (CPU tests, small fields)."""
        if self._mxund_cache is None:
            from .. import ntt as _ntt
            field = self.field
            f = field.host
            context = self.context
            p = field.modulus
            T = context.trace_length
            Ne, Nc = self.Ne, context.composition_domain_size
            specs = {
                "w_T_inv": (T, f.inv(f.get_root_of_unity(T)),
                            f.inv(T % p)),
                "w_Ne": (Ne, f.get_root_of_unity(Ne), 1),
                "w_Nc": (Nc, f.get_root_of_unity(Nc), 1),
                "w_Nc_inv": (Nc, f.inv(f.get_root_of_unity(Nc)),
                             f.inv(Nc % p)),
            }
            out = {}
            if self.mesh is not None:
                from ..parallel.ntt_dist import can_distribute
                n_dev = self.mesh.devices.size
                for key, (size, root, _) in specs.items():
                    if not (_ntt._use_mxu() and field.element_size == 16
                            and size >= _ntt._mxu_min_n()
                            and can_distribute(size, n_dev)):
                        continue
                    n1 = 1 << ((size.bit_length() - 1) // 2)
                    n2 = size // n1
                    if _ntt.mxu_levels(n1) is None or \
                            _ntt.mxu_levels(n2) is None:
                        continue
                    pair = tuple(
                        jax.tree.map(self._put, _ntt.get_mxu_plan(
                            field, m, pow(root, size // m, p), 1).bundle())
                        for m in (n1, n2))
                    out[key] = {"dist": pair}
            else:
                # single-chip only: the std-emitting Ne LDE bundle folds
                # R^-1 into its level-1 digit matrix so stage A's committed
                # evaluation vectors come out in STANDARD form with no
                # from-Montgomery pass (levels 2+ share _w_digits_np's
                # host cache with the plain w_Ne bundle)
                specs["w_Ne_std"] = (Ne, f.get_root_of_unity(Ne),
                                     f.inv(field.params.R_mod % p))
                for key, (size, root, scale) in specs.items():
                    if _ntt.mxu_applicable(field, size):
                        bundle = _ntt.get_mxu_plan(field, size, root,
                                                   scale).bundle()
                        out[key] = jax.tree.map(self._put, bundle)
            self._mxund_cache = out
        return self._mxund_cache

    def _put(self, arr) -> jnp.ndarray:
        """Host array -> device; replicated over the mesh when one is set
        (host-origin inputs are tiny or reused across the whole domain)."""
        if self.mesh is None:
            return jnp.asarray(arr)
        from jax.sharding import NamedSharding, PartitionSpec as P
        return jax.device_put(arr, NamedSharding(self.mesh, P()))

    def _put16(self, arr: np.ndarray) -> jnp.ndarray:
        """Upload a 16-bit-limb u32 array as uint16: the tunnelled backend
        moves host->device bytes at ~40 MB/s, so halving the trace/static
        upload (8 MB at 2^17 steps, 64 MB at 2^20) takes ~100 ms off every
        proof; the stages widen back to u32 in-program (one free cast)."""
        if arr.dtype != np.uint16:
            arr = arr.astype(np.uint16)
        return self._put(arr)

    def _slice_tables(self, tpack):
        """Lazy view of the packed parameter, keyed by spec name: tables are
        sliced (and factored ones regenerated as outer[j]*inner[k]) only when
        actually USED by the requesting stage — generating a full [L, Ne]
        table is itself a GB-scale operation at Ne = 2^24, and each stage
        needs only a subset."""
        return _LazyTables(self, tpack)

    # ------------------------------------------------------------------ trace
    def _helpers(self, tpack, mxund=None):
        """Shared traced helpers (tables, mesh sharding, layout pinning,
        transforms) used by the stage methods."""
        context = self.context
        field = self.field
        dev = field.device
        f = field.host
        T = context.trace_length
        tb = self._slice_tables(tpack)
        # mx entries: single-chip whole-transform bundles, or (mesh mode)
        # {"dist": (b1, b2)} pairs consumed by the 4-step locals inside
        # shard_map — see _get_mxund and _mx_single/_mx_dist
        mx = mxund or {}

        mesh = self.mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from ..parallel.ntt_dist import can_distribute, dist_ntt_core
            n_dev = mesh.devices.size
            ax = mesh.axis_names[0]

        def shard_dom(x):
            """Constrain the trailing (domain) axis over the mesh."""
            if mesh is None:
                return x
            spec = P(*([None] * (x.ndim - 1) + [ax]))
            return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

        def pin_rows_minor(x):
            """Pin a word-major [8, rows] digest buffer to the rows-minor
            layout.  XLA's layout assignment sometimes normalizes these to
            {0,1} (8-wide minor), which tile-pads 8 lanes -> 128 — a 16x HBM
            blowup that OOMs the 2^24-domain Merkle buffers (observed: a
            22 GB allocation for the 1.4 GB tree concat)."""
            import os
            if os.environ.get("GENSTARK_NO_LAYOUT_PIN"):
                return x
            if mesh is not None or jax.default_backend() != "tpu":
                return x
            from jax.experimental.layout import Layout, with_layout_constraint
            return with_layout_constraint(x, Layout(major_to_minor=(0, 1)))

        def transform(x, n, w_key):
            if mesh is not None and can_distribute(n, n_dev):
                return shard_dom(dist_ntt_core(field, x, n, tb[w_key], mesh,
                                               mxu_local=_mx_dist(mx, w_key)))
            bundle = _mx_single(mx, w_key)
            if bundle is not None:
                return ntt.mxu_transform_core(field, x, n, bundle)
            w_table = tb[w_key]
            panel = tb.get("p4_" + w_key)
            if panel is not None:
                return ntt._four_step_core(field, x, n, w_table, panel=panel)
            return ntt.ntt_core_table(field, x, n, w_table)

        def intt_t(x):
            out = transform(x, T, "w_T_inv")
            if _mx_single(mx, "w_T_inv") is not None:
                return out            # n^-1 folded into the MXU digit matrix
            n_inv = dev.const(f.inv(T % field.modulus), shape=(1,))
            moved = jnp.moveaxis(out, -2, 0) if out.ndim > 2 else out
            scaled = dev.mont_mul(moved, n_inv)
            return jnp.moveaxis(scaled, 0, -2) if out.ndim > 2 else scaled

        def lde(x, n, w_key):
            pad = [(0, 0)] * (x.ndim - 1) + [(0, n - x.shape[-1])]
            return transform(jnp.pad(x, pad), n, w_key)

        def cmap1(fn, *arrays):
            """Apply an elementwise(-along-the-domain) op in sequential
            chunks via lax.map.  One full-domain Montgomery reduction holds
            a [2L+1, Ne] accumulator plus several [L, Ne] temps — ~4 GB at
            Ne = 2^24 — all of which scale down with the chunk size; the
            values themselves are unchanged (pure elementwise math).
            fn must return one array shaped like its (broadcast) inputs.

            When the elementwise ops route to the Pallas tile kernels
            (field/pallas_ops.py) the temp-bounding is already done inside
            the kernel, and the lax.map wrapper only adds dynamic-slice /
            update-slice traffic around every op (measured ~150 ms of
            `while` overhead in the 2^20 lcomb stage) — so the map is
            skipped up to the footprint cap (_unchunk_ne).

            Under a mesh the per-chunk trailing axis keeps the domain
            sharding (each sequential chunk is itself spread over the
            devices), so chunking and sharding compose: per-device temp
            footprint is chunk/D."""
            n = arrays[0].shape[-1]
            chunks = n // self._chunk_elems
            if mesh is None and field.device._use_pallas_ops() and \
                    n <= self._unchunk_ne:
                return fn(*arrays)
            if chunks < 2 or (mesh is not None and
                              (n // chunks) % n_dev != 0):
                return fn(*arrays)
            parts = tuple(
                shard_dom(jnp.moveaxis(
                    a.reshape(a.shape[:-1] + (chunks, -1)), -2, 0))
                for a in arrays)
            out = jax.lax.map(lambda t: shard_dom(fn(*t)), parts)  # [C, ..., n/C]
            out = jnp.moveaxis(out, 0, -2)               # [..., C, n/C]
            return shard_dom(out.reshape(out.shape[:-2] + (n,)))

        return tb, shard_dom, pin_rows_minor, intt_t, lde, cmap1

    def _scan_trace(self, ckpt: jnp.ndarray, statics) -> jnp.ndarray:
        """Rebuild the full Montgomery trace [R, L, T] from checkpoint
        states ckpt [R, L, n_seg] (the state at step s*K for each segment,
        K = T / n_seg) by running the transition K-1 steps per segment —
        ONE lax.scan whose per-step state is [R, L, n_seg], so the serial
        recurrence is vectorized across segments.  Uses the same IR
        evaluator as the constraint stage (air.ir.eval_device), so every
        value is bit-identical to the host/native trace."""
        import jax as _jax
        from ..air.ir import count_nodes, eval_device
        context = self.context
        dev = self.field.device
        schema = context.schema
        L = dev.L
        R = schema.trace_width
        T = context.trace_length
        n_seg = self._trace_scan_nseg
        K = T // n_seg
        Kr = statics.shape[0] if statics is not None else 0
        if Kr:
            st = statics.reshape(Kr, L, n_seg, K)
            xs = jnp.moveaxis(st, 3, 0)[:K - 1]      # statics at steps 0..K-2
        else:
            xs = jnp.zeros((K - 1, 0, L, n_seg), dtype=jnp.uint32)
        seed_env = [dev.const(s, shape=(1,)) for s in context.seed]

        def body(state, st_k):                       # state: [R, L, n_seg]
            env = {"dev": dev, "ndim": 1,
                   "trace": [state[r] for r in range(R)],
                   "static": [st_k[j] for j in range(Kr)],
                   "seed": seed_env}
            nxt = jnp.stack([eval_device(e, env, {})
                             for e in schema.transition])
            return nxt, nxt

        body_ops = count_nodes(schema.transition)
        unroll = max(1, min(8, 64 // max(1, body_ops // 8)))
        _, rows = _jax.lax.scan(body, ckpt, xs, unroll=unroll)
        all_rows = jnp.concatenate([ckpt[None], rows], axis=0)  # [K, R, L, S]
        return jnp.transpose(all_rows, (1, 2, 3, 0)).reshape(R, L, T)

    def _stage_commit(self, trace_std, statics_parts, tpack, mxund):
        """Reference steps 3-4 (/root/reference/lib/Stark.ts:104-119):
        trace interpolation, LDE, static-register evaluations, evaluation
        Merkle tree.  Returns (p_polys, static_polys, e_std, e_flat, e_root).

        The evaluation vectors are produced DIRECTLY in standard form: the
        MXU "w_Ne_std" bundle folds R^-1 into its level-1 digit matrix (the
        same trick the iNTT uses for n^-1 — zero extra cost), and the
        non-MXU paths apply R^-1 on the COEFFICIENTS (size T = Ne/ext)
        before the LDE.  No full-domain from-Montgomery pass exists
        anywhere in the prover: stage B's pointwise tail and the FRI fold
        chain both consume standard-form values against Montgomery
        coefficient tables (mont_mul(v, cR) = v*c keeps values standard)."""
        context = self.context
        field = self.field
        dev = field.device
        hash_ = self.hash
        Ne = self.Ne
        Nc = context.composition_domain_size
        R = context.schema.trace_width
        T = context.trace_length
        elem = field.element_size
        tb, shard_dom, pin_rows_minor, intt_t, lde, cmap1 = \
            self._helpers(tpack, mxund)

        # Phase barriers: without them XLA's latency-hiding scheduler
        # interleaves the LDE / from-Montgomery / hash / tree phases, holding
        # several full-domain temps alive at once — at Ne = 2^24 that pushed
        # the stage's peak HBM past capacity.  Each barrier closes a phase
        # so its temps can be freed before the next phase's are allocated.
        # Only the large-domain split mode needs them; in the single-program
        # small-domain mode they just serialize the schedule (measured ~10%
        # steady-state cost at Ne = 2^17), so they are identity there.
        barrier = jax.lax.optimization_barrier if self._split else \
            (lambda x: x)

        # statics assemble early ONLY when the checkpoint trace scan
        # consumes them; otherwise defer past the trace-LDE phase barrier so
        # the [K, L, T] Montgomery statics don't stay live across the big
        # trace-LDE allocations the barriers keep apart (~2 GB at K=64,
        # T=2^20 in split mode)
        def _statics_mont():
            s_std = self._assemble_statics(statics_parts)
            k = s_std.shape[0]
            return (_to_mont_batch(dev, s_std) if k else None), k
        if self._trace_scan_nseg:
            statics, K = _statics_mont()

        trace_std = trace_std.astype(jnp.uint32)      # u16 upload (see _put16)
        trace = _to_mont_batch(dev, trace_std)    # [R, L, T] or [R, L, n_seg]
        if self._trace_scan_nseg:
            trace = self._scan_trace(trace, statics)            # [R, L, T]
        p_polys = intt_t(trace)
        std_b = (mxund or {}).get("w_Ne_std") is not None
        if std_b:
            p_e_std = lde(p_polys, Ne, "w_Ne_std")              # [R, L, Ne]
        else:
            p_src = jnp.stack([dev._from_mont(p_polys[r]) for r in range(R)])
            p_e_std = lde(p_src, Ne, "w_Ne")
        e_vectors_std = [p_e_std[r] for r in range(R)]
        p_polys, e_vectors_std = barrier((p_polys, e_vectors_std))
        if not self._trace_scan_nseg:
            statics, K = _statics_mont()

        # static registers: polynomials once, then per-domain evaluations
        if K:
            static_polys = intt_t(statics)
            s_src = None if std_b else jnp.stack(
                [dev._from_mont(static_polys[k]) for k in range(K)])
            for k in self.secret_idx:
                e_vectors_std.append(
                    lde(static_polys[k], Ne, "w_Ne_std") if std_b
                    else lde(s_src[k], Ne, "w_Ne"))
                e_vectors_std = barrier(e_vectors_std)
        else:
            static_polys = jnp.zeros((0, dev.L, T), dtype=jnp.uint32)

        e_std = barrier(jnp.stack(e_vectors_std))               # [V, L, Ne]
        V = len(e_vectors_std)
        leaves = shard_dom(pin_rows_minor(hash_.merge_element_rows(
            [e_std[v] for v in range(V)], elem)))
        # NO barrier on the word-major leaves: optimization_barrier
        # materializes a copy whose layout XLA re-normalizes to {0,1}
        # (8-wide minor), tile-padding 8 lanes -> 128 — a 16 GB allocation
        # at Ne = 2^25 (the phase temps it used to free are gone now that
        # the elementwise chains run as Pallas tile kernels)
        e_flat = pin_rows_minor(build_tree_flat(hash_, leaves, Ne))
        e_root = fs.root_words(e_flat, Ne)
        return p_polys, static_polys, e_std, e_flat, e_root

    def _stage_lcomb(self, p_polys, static_polys, e_std, i_polys_std, e_root,
                     tpack, mxund):
        """Reference steps 5-6 (Stark.ts:121-131): composition polynomial +
        random linear combination, with the transcript coefficients derived
        on device from the e-tree root.  Returns l_evals [L, Ne] in
        STANDARD form: the coefficients that multiply Montgomery-form terms
        (d/b) are converted to standard form (tiny [L, K] arrays), so every
        additive term of the combination lands in standard form —
        mont_mul(vR, c) = v*c — and the standard-form e_std vectors combine
        against the MONTGOMERY l-coefficients directly (mont_mul(v, cR) =
        v*c), which deletes the to-Montgomery reconstruction pass
        entirely."""
        context = self.context
        field = self.field
        dev = field.device
        Ne = self.Ne
        Nc = context.composition_domain_size
        T = context.trace_length
        R = context.schema.trace_width
        K = static_polys.shape[0]
        tb, shard_dom, _, _, lde, cmap1 = self._helpers(tpack, mxund)
        static_evals_nc = (lde(static_polys, Nc, "w_Nc") if K else
                           jnp.zeros((0, dev.L, Nc), dtype=jnp.uint32))

        n_ps = (R + (e_std.shape[0] - R)) * \
            (2 if self.l_comb.ps_incremental_degree > 0 else 1)
        total = self.c_poly.coefficient_count + n_ps
        stream = fs.prng_elements_dev(field, e_root, total)     # [L, total]
        dc = self.c_poly.d_coefficient_count
        bc = self.c_poly.b_coefficient_count
        # d/b coefficients multiply MONTGOMERY-form terms and must land the
        # sum in standard form -> convert the tiny coefficient arrays to
        # standard; l coefficients multiply the STANDARD-form e_std vectors
        # -> keep Montgomery.  (mont_mul(vR, c) = mont_mul(v, cR) = v*c.)
        d_coeffs = dev._from_mont(stream[:, :dc])
        b_coeffs = dev._from_mont(stream[:, dc:dc + bc])
        l_coeffs = stream[:, dc + bc:]

        cf = Nc // T
        p_evals_nc = lde(p_polys, Nc, "w_Nc")
        n_evals_nc = jnp.roll(p_evals_nc, -cf, axis=-1)
        q_evals = shard_dom(context.evaluate_transition_constraints_traced(
            p_evals_nc, n_evals_nc,
            [static_evals_nc[k] for k in range(K)]))
        i_polys_std = i_polys_std.astype(jnp.uint32)  # u16 upload (see _put16)
        i_polys_mont = _to_mont_batch(dev, i_polys_std) if i_polys_std.shape[0] \
            else i_polys_std

        chunks = Ne // self._chunk_elems
        if self.mesh is None and dev._use_pallas_ops() and \
                Ne <= self._unchunk_ne:
            # Pallas tile kernels bound their own temps — run the pointwise
            # tail as ONE full-domain pass (chunks=1) instead of a lax.map
            # (the map's per-chunk dynamic slices cost ~150 ms at 2^24)
            chunks = 1
        fac = self._factored(Ne)     # dom_fwd/incr have length Ne
        chunk_ok = chunks >= 1 and fac is not None
        if chunk_ok:
            s, nj = fac
            M = Ne // chunks
            chunk_ok = (nj % chunks == 0 and M % s == 0
                        and M % context.extension_factor == 0)
            if self.mesh is not None:
                chunk_ok = chunk_ok and M % self.mesh.devices.size == 0
        if chunk_ok:
            return self._lcomb_chunked(tb, q_evals, i_polys_mont, p_polys,
                                       e_std, d_coeffs, b_coeffs, l_coeffs,
                                       chunks, mxund)

        mx = mxund or {}
        c_tables = {
            "domain": tb["dom_fwd"],
            "nc_inv_w": None if _mx_single(mx, "w_Nc_inv") else tb["w_Nc_inv"],
            "ne_fwd_w": None if _mx_single(mx, "w_Ne") else tb["w_Ne"],
            "nc_inv_panel": tb.get("p4_w_Nc_inv"),
            "ne_fwd_panel": tb.get("p4_w_Ne"),
            "nc_inv_mxu": _mx_single(mx, "w_Nc_inv"),
            "ne_fwd_mxu": _mx_single(mx, "w_Ne"),
            "incr": tb.get("incr"),
            "adjust": {gi: tb[f"adj{gi}"]
                       for gi, g in enumerate(self.c_poly.constraint_groups)
                       if g["degree"] != self.c_poly.combination_degree},
            "bdiv": [[(tb[f"bc{b}_{j}"], tb[f"bci{b}_{j}"])
                      for j in range(len(c["xs"]))]
                     for b, (r, c) in enumerate(self.c_poly.b_poly.polys.items())],
        }
        c_evals = shard_dom(self.c_poly.evaluate_all(
            p_polys, None, context, d_coeffs_mont=d_coeffs,
            b_coeffs_mont=b_coeffs, b_ipolys_mont=i_polys_mont, q_evals=q_evals,
            tables=c_tables))

        # standard-form values x Montgomery coefficients -> standard form
        ps = [e_std[v] for v in range(e_std.shape[0])]
        if self.l_comb.ps_incremental_degree > 0:
            ps = ps + [dev.mont_mul(v, tb["incr"]) for v in ps]
        return shard_dom(dev._add(c_evals, dev.combine_many_mont(ps, l_coeffs)))

    def _lcomb_chunked(self, tb, q_evals, i_polys_mont, p_polys, e_std,
                       d_coeffs, b_coeffs, l_coeffs, chunks, mxund=None):
        """Composition + linear combination with every pointwise-over-Ne op
        run chunk-at-a-time (lax.map) — same math and transcript as the
        unchunked path (pinned by tests/test_split_stages.py), but peak HBM
        scales with Ne/chunks instead of Ne: a single full-domain Montgomery
        multiply chain holds multiple [2L+1, Ne] accumulators (~39 GB total
        for this stage at Ne = 2^24 unchunked).

        Structure: the composition-domain work (constraint eval, degree
        adjust, combination, iNTT) happens at Nc <= Ne/4 full-size; the big
        LDEs (qe, boundary quotients) are NTTs; everything after — domain
        power generation, Z-inverses, boundary/ps degree raises, random
        linear combinations — is pointwise and mapped over domain chunks,
        with the domain/incr power chunks generated in-chunk from the
        factored tables."""
        context = self.context
        field = self.field
        dev = field.device
        f = field.host
        L = dev.L
        Ne = self.Ne
        Nc = context.composition_domain_size
        T = context.trace_length
        R = context.schema.trace_width
        V = e_std.shape[0]
        M = Ne // chunks

        mesh = self.mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            ax = mesh.axis_names[0]

        def _sd(x):
            """Constrain the trailing (per-chunk domain) axis over the mesh
            so chunking and sharding compose (see cmap1)."""
            if mesh is None:
                return x
            spec = P(*([None] * (x.ndim - 1) + [ax]))
            return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

        # --- composition-domain combination (CompositionPolynomial
        # evaluate_all steps 1-3, tables path) ---------------------------------
        qa = [q_evals[i] for i in range(q_evals.shape[0])]
        for gi, group in enumerate(self.c_poly.constraint_groups):
            if group["degree"] == self.c_poly.combination_degree:
                continue
            powers = tb[f"adj{gi}"]
            for i in group["indexes"]:
                qa.append(dev.mont_mul(qa[i], powers))
        qc = dev.combine_many_mont(qa, d_coeffs)                 # [L, Nc]
        mx = mxund or {}
        b_nc_inv = _mx_single(mx, "w_Nc_inv")
        if b_nc_inv is not None:      # Nc^-1 folded into the MXU digits
            qc_poly = ntt.mxu_transform_core(field, qc, Nc, b_nc_inv)
        else:
            qc_poly = ntt.ntt_core_table(field, qc, Nc, tb["w_Nc_inv"])
            qc_poly = dev.mont_mul(qc_poly, dev.const(f.inv(Nc), shape=(1,)))
        qc_pad = jnp.pad(qc_poly, [(0, 0), (0, Ne - Nc)])
        b_ne = _mx_single(mx, "w_Ne")
        if b_ne is not None:
            qe = ntt.mxu_transform_core(field, qc_pad, Ne, b_ne)
        else:
            qe = ntt.ntt_core_table(field, qc_pad, Ne, tb["w_Ne"])   # [L, Ne]

        # --- boundary quotient polynomials + LDE (BoundaryConstraints) -------
        b_vectors = self.c_poly.b_poly.evaluate_all(
            p_polys, Ne, i_polys_mont=i_polys_mont,
            tables={"bdiv": [[(tb[f"bc{b}_{j}"], tb[f"bci{b}_{j}"])
                              for j in range(len(c["xs"]))]
                             for b, (r, c) in
                             enumerate(self.c_poly.b_poly.polys.items())],
                    "ne_fwd_w": None if _mx_single(mx, "w_Ne") else tb["w_Ne"],
                    "ne_fwd_mxu": _mx_single(mx, "w_Ne")})
        B = len(b_vectors)
        b_stack = (jnp.stack(b_vectors) if b_vectors
                   else jnp.zeros((0, L, Ne), dtype=jnp.uint32))

        # --- pointwise-over-Ne tail, chunked ----------------------------------
        z = self.c_poly.z_poly
        ext = context.extension_factor
        w_t = field.exp(context.root_of_unity, T)
        base = [f.sub(f.exp(w_t, j), 1) for j in range(ext)]
        inv_base = [f.inv(v) if v else 0 for v in base]
        inv_series = dev.from_ints(inv_base)                     # [L, ext]
        x_last_c = dev.const(z.x_at_last_step, shape=(1,))
        b_incremental = self.c_poly.composition_degree - T
        need_incr = (b_incremental > 0 or
                     self.l_comb.ps_incremental_degree > 0)
        dom_outer, dom_inner = tb.parts("dom_fwd")
        incr_parts = tb.parts("incr") if (need_incr and "incr" in tb) else None

        if chunks == 1 and mesh is None and dev._use_pallas_ops():
            # the whole pointwise tail as ONE Pallas kernel (qe, the
            # boundary and evaluation vectors each read once, every
            # multiply in VMEM) — ~12 separate full-domain passes
            # otherwise; bit-identical (tests/test_lcomb_kernel.py)
            from .lincomb_kernel import lcomb_tail
            fused = lcomb_tail(
                dev, qe, b_stack, e_std, (dom_outer, dom_inner),
                incr_parts, inv_series, z.x_at_last_step, b_coeffs,
                l_coeffs, b_incremental > 0,
                self.l_comb.ps_incremental_degree > 0, ext)
            if fused is not None:
                return fused
            # kernel declined via its shape guards: restore the lax.map
            # memory guard (chunks was forced to 1 only on the promise the
            # Pallas kernel would bound its own temps — an unchunked body
            # pass holds ~10 full-domain [L, Ne] buffers)
            nfall = Ne // self._chunk_elems
            nj, s = dom_outer.shape[-1], dom_inner.shape[-1]
            if (nfall >= 2 and nj % nfall == 0 and (Ne // nfall) % s == 0
                    and (Ne // nfall) % ext == 0):
                chunks = nfall
                M = Ne // chunks

        def _chunked(a):
            # [..., Ne] -> [chunks, ..., M] for lax.map
            return jnp.moveaxis(a.reshape(a.shape[:-1] + (chunks, M)), -2, 0)

        def _outer_chunks(outer):
            # outer [L, nj] -> [chunks, L, nj/chunks]; chunk c's absolute
            # positions are [c*M, (c+1)*M), and M is a multiple of the inner
            # length s, so outer splits cleanly along j
            nj = outer.shape[-1]
            return jnp.moveaxis(
                outer.reshape(outer.shape[:-1] + (chunks, nj // chunks)),
                -2, 0)

        xs = (_sd(_chunked(qe)), _sd(_chunked(b_stack)), _sd(_chunked(e_std)),
              _outer_chunks(dom_outer),
              _outer_chunks(incr_parts[0]) if incr_parts is not None
              else jnp.zeros((chunks, L, 0), dtype=jnp.uint32))

        def body(args):
            qe_c, b_c, e_c, dom_o, incr_o = args
            dom_c = dev.outer_table(dom_o, dom_inner)
            # Z(x)^-1 = (x - x_last) * inv(x^T - 1): x^T is ext-periodic, so
            # the inverted numerator series tiles (ZeroPolynomial semantics;
            # M is a multiple of ext, so every chunk sees the same tiling)
            zinv_c = dev.mont_mul(dev._sub(dom_c, x_last_c),
                                  jnp.tile(inv_series, (1, M // ext)))
            d_c = dev.mont_mul(qe_c, zinv_c)
            incr_c = None
            if incr_parts is not None:
                incr_c = dev.outer_table(incr_o, incr_parts[1])
            ba = [b_c[i] for i in range(B)]
            if b_incremental > 0:
                ba += [dev.mont_mul(v, incr_c) for v in ba[:B]]
            c_c = d_c if not ba else dev._add(
                d_c, dev.combine_many_mont(ba, b_coeffs))
            # e_c is standard form; l_coeffs Montgomery -> terms standard
            ps = [e_c[v] for v in range(V)]
            if self.l_comb.ps_incremental_degree > 0:
                ps = ps + [dev.mont_mul(v, incr_c) for v in ps[:V]]
            return _sd(dev._add(c_c, dev.combine_many_mont(ps, l_coeffs)))

        if chunks == 1:
            # single full-domain pass: no lax.map, no per-chunk slicing
            # (the fused Pallas tail was already attempted above)
            return _sd(body(tuple(x[0] for x in xs)))
        out = jax.lax.map(body, xs)                              # [chunks, L, M]
        return _sd(jnp.moveaxis(out, 0, -2).reshape(L, Ne))

    def _stage_fri(self, l_evals, tpack, mxund):
        """Reference step 7 (Stark.ts:133-144 + LowDegreeProver): the full
        fold-by-4 FRI chain with per-layer Merkle commitments.  Every layer
        gets a committed tree — INCLUDING the final remainder layer, whose
        root is the last column root the verifier re-commits against
        (/root/reference/lib/components/LowDegreeProver.ts:161-167); the fold
        of layer d is seeded by layer d's own tree root.  Returns
        (fri_cat [8, sum rows], vals_cat [L, sum cols], roots [1+layers, 8],
         remainder_std)."""
        context = self.context
        field = self.field
        dev = field.device
        hash_ = self.hash
        Ne = self.Ne
        elem = field.element_size
        tb, shard_dom, pin_rows_minor, _, _, cmap1 = self._helpers(tpack, mxund)

        roots = []
        tree_flats = []
        layer_stds = []
        # l_evals and every fold output are STANDARD form already (stage B
        # emits std; fold_traced is representation-preserving — its value
        # multiplies all carry Montgomery coefficients), so the former
        # per-layer from-Montgomery pass (full-domain at depth 0) is gone.
        values = l_evals
        all_layers = self.layer_sizes + [self.remainder_size]
        for depth, n in enumerate(all_layers):
            v_std = values
            layer_stds.append(v_std)
            row_hashes = shard_dom(pin_rows_minor(
                hash_.digest_stride_rows(v_std, elem)))
            flat = pin_rows_minor(build_tree_flat(hash_, row_hashes, n // 4))
            tree_flats.append(flat)
            cur_root = fs.root_words(flat, n // 4)
            roots.append(cur_root)
            if depth < len(self.layer_sizes):
                s = fs.prng_single_dev(field, cur_root)         # [L, 1]
                s2 = dev.mont_mul(s, s)
                # the stride-N/4 view inside the fold is the FRI transpose —
                # re-constraining the output lets XLA place it as one
                # all-to-all per layer (LowDegreeProver.ts:190-198 analog)
                values = shard_dom(
                    fold_traced(field, context.root_of_unity, Ne, depth,
                                values, s, s2,
                                xtabs=(tb[f"fold{depth}"], tb[f"foldi{depth}"])))
        remainder_std = layer_stds[-1]                          # [L, rem]

        fri_cat = pin_rows_minor(jnp.concatenate(tree_flats, axis=1))
        vals_cat = jnp.concatenate(layer_stds, axis=1)          # [L, sum]
        roots_cat = jnp.stack(roots)                            # [layers+1, 8]
        return fri_cat, vals_cat, roots_cat, remainder_std

    def _pipeline(self, trace_std, statics_parts, i_polys_std, tpack, mxund):
        """The whole prover (reference steps 3-7, Stark.ts:104-144) as ONE
        traced program — used for small/medium domains where a single
        dispatch wins.  Large domains run the three stage programs instead
        (see _split in __init__): one program's XLA temp footprint for the
        full pipeline at Ne = 2^24 exceeds HBM (measured 37 GB unpadded),
        while per-stage programs fit because dead full-domain intermediates
        are actually freed at stage boundaries.

        Returns (e_flat, fri_cat, e_std, vals_cat, roots, remainder_std):
          e_flat   [8, e-tree rows]      — evaluation tree (word-major)
          fri_cat  [8, sum fri rows]     — FRI layer trees, concatenated
          e_std    [V, L, Ne]            — committed evaluation vectors (std)
          vals_cat [L, sum layer cols]   — FRI layer values (std), lc first
          roots    [1 + n_layers, 8]     — e-root, lc-root, column roots...
          remainder_std [L, remainder]
        """
        p_polys, static_polys, e_std, e_flat, e_root = \
            self._stage_commit(trace_std, statics_parts, tpack, mxund)
        l_evals = self._stage_lcomb(p_polys, static_polys, e_std,
                                    i_polys_std, e_root, tpack, mxund)
        fri_cat, vals_cat, fri_roots, remainder_std = self._stage_fri(
            l_evals, tpack, mxund)
        roots_cat = jnp.concatenate([e_root[None], fri_roots], axis=0)
        return e_flat, fri_cat, e_std, vals_cat, roots_cat, remainder_std

    # ------------------------------------------------- one-fetch proof tail
    # Candidate window for the device rejection sampler: odd-hex transcript
    # states (P = 1/16) make runs of ~16 consecutive candidates hash
    # identically (queries.py's Node odd-nibble drop absorbs the +1), so
    # the window is ~16x the worst-case need; exhaustion falls back to the
    # host sampler.
    @staticmethod
    def _n_cand(count: int) -> int:
        return 32 * count + 512

    def _packed_tail(self, e_flat, fri_cat, vals_cat, e_std, e_root,
                     fri_roots):
        """Traced one-fetch proof tail: device-side transcript sampling
        (protocol/device_queries — bit-exact with queries.py), batch-proof
        planning (plan_rows_dev == merkle.plan_batch), the packed gather,
        and the roots — everything the host needs in ONE transfer, so the
        proof has NO mid-proof device->host sync (the former roots fetch +
        host sampling + second gather dispatch cost ~30-55 ms of tunnel
        round-trips per proof; reference flow: Stark.ts:133-150).

        Layout (u32): [rows_e*8 | rows_f*8 | cols*L | evals*V*L |
        exe_pos+found | per-layer pos+found | root words].  The host
        re-derives positions and plans from the fetched roots and compares
        them with the fetched device positions; any disagreement falls
        back to the host-sampled path (see prove)."""
        from . import device_queries as dq
        from ..merkle import _level_offset
        idx_gen = self.stark.index_generator
        context = self.context
        Ne = self.Ne
        ext = context.extension_factor
        exe_count = min(idx_gen.exe_query_count, Ne - Ne // ext)
        fri_q = idx_gen.fri_query_count
        exe_q = idx_gen.exe_query_count
        all_layers = self.layer_sizes + [self.remainder_size]
        tree_sizes = [Ne] + [n // 4 for n in all_layers]
        fri_offsets = np.cumsum([0] + [tree_row_count(n)
                                       for n in tree_sizes[1:]])
        capRe, capRf, capC, capE = self._caps
        u32 = jnp.uint32

        def concat_sections(sections, total_cap):
            """[(arr int32[cap_k], n_k)] -> one int32[total_cap]: each
            section's first n_k entries packed contiguously (the variable-
            length analog of the host's list concatenation)."""
            out = jnp.zeros((total_cap + 1,), dtype=jnp.int32)
            offset = jnp.int32(0)
            for arr, n in sections:
                pos = jax.lax.iota(jnp.int32, arr.shape[0])
                dest = jnp.where(pos < n, offset + pos,
                                 jnp.int32(total_cap))
                out = out.at[dest].set(arr, mode="drop")
                offset = offset + n
            return out[:total_cap]

        lc_root = fri_roots[0]
        exe_pos, exe_found = dq.sample_indexes_dev(
            lc_root, exe_count, Ne, ext, self._n_cand(exe_count))
        aug_pos, n_aug = dq.augment_stark(exe_pos, ext, Ne)
        lc_aug, n_lc_aug = dq.augment_fri(exe_pos, Ne)

        # per-layer FRI sampling (each seeded by the NEXT layer's root,
        # exactly as the host loop: layer_roots[i + 1])
        layer_pos, layer_aug = [], []
        founds = [exe_found]
        for i, n in enumerate(self.layer_sizes):
            column_length = n // 4
            pos_i, found_i = dq.sample_indexes_dev(
                fri_roots[i + 1], fri_q, column_length, ext,
                self._n_cand(fri_q))
            aug_i, n_aug_i = dq.augment_fri(pos_i, column_length)
            layer_pos.append((pos_i, jnp.int32(fri_q)))
            layer_aug.append((aug_i, n_aug_i))
            founds.append(found_i)

        # plans in host order: e(tree 0), lc(tree 1), then per layer
        # (col tree i+2, poly tree i+1); rows_e is plan 0, rows_f the rest
        def plan_rows(tree_index, positions, n_pos):
            n_leaves = tree_sizes[tree_index]
            depth = n_leaves.bit_length() - 1
            cap = positions.shape[0] * (1 + depth)
            rows, n_rows = dq.plan_rows_dev(positions, n_pos, depth,
                                            n_leaves, cap, _level_offset)
            if tree_index:
                base = np.int32(int(fri_offsets[tree_index - 1]))
                rows = rows + base          # padding polluted, masked below
            return rows, n_rows

        rows_e, n_rows_e = plan_rows(0, aug_pos, n_aug)
        rows_e_pad = concat_sections([(rows_e, n_rows_e)], capRe)
        f_sections = [plan_rows(1, lc_aug, n_lc_aug)]
        for i in range(len(self.layer_sizes)):
            f_sections.append(plan_rows(i + 2, *layer_aug[i]))
            f_sections.append(plan_rows(i + 1, *layer_pos[i]))
        rows_f_pad = concat_sections(f_sections, capRf)

        # column-value indices: remainder prefix (static) + per (layer,
        # rows) section expanded x4 (r-major, j-inner — Stark.ts layout)
        layer_col_offsets = np.cumsum([0] + list(all_layers))
        rem_base = int(layer_col_offsets[-2])
        rem_idx = (np.int32(rem_base) +
                   jax.lax.iota(jnp.int32, self.remainder_size))
        val_sections = [(rem_idx, jnp.int32(self.remainder_size))]
        lc_rows = [(0, lc_aug, n_lc_aug)]
        for i in range(len(self.layer_sizes)):
            lc_rows.append((i + 1,) + layer_aug[i])
            lc_rows.append((i,) + layer_pos[i])
        for layer, rows, n_rows in lc_rows:
            m = all_layers[layer] // 4
            base = np.int32(int(layer_col_offsets[layer]))
            idx4 = (base + rows[:, None] +
                    (np.arange(4, dtype=np.int32) * m)[None, :])
            val_sections.append((idx4.reshape(-1), n_rows * 4))
        cols_pad = concat_sections(val_sections, capC)
        e_pad = concat_sections([(aug_pos, n_aug)], capE)

        # the packed gather (same as _packed_gather) + checks + roots
        rows_e_t = jnp.take(e_flat, rows_e_pad, axis=1).T
        rows_f_t = jnp.take(fri_cat, rows_f_pad, axis=1).T
        cols = jnp.take(vals_cat, cols_pad, axis=1)
        evals = jnp.take(e_std, e_pad, axis=2)
        checks = [exe_pos.astype(u32), exe_found[None].astype(u32)]
        for i in range(len(self.layer_sizes)):
            checks.append(layer_pos[i][0].astype(u32))
            checks.append(founds[i + 1][None].astype(u32))
        roots_flat = jnp.concatenate([e_root, fri_roots.reshape(-1)])
        return jnp.concatenate(
            [rows_e_t.reshape(-1), rows_f_t.reshape(-1), cols.reshape(-1),
             evals.reshape(-1)] + checks + [roots_flat])

    def _pipeline_packed(self, trace_std, statics_parts, i_polys_std, tpack,
                         mxund):
        """The ENTIRE proof as one program: pipeline + device transcript +
        packed gather — one dispatch, one fetch (small/medium domains)."""
        e_flat, fri_cat, e_std, vals_cat, roots_cat, _ = self._pipeline(
            trace_std, statics_parts, i_polys_std, tpack, mxund)
        return self._packed_tail(e_flat, fri_cat, vals_cat, e_std,
                                 roots_cat[0], roots_cat[1:])

    # --------------------------------------------------------------- assembly
    # ------------------------------------------------- export (trace) cache
    # Warm-start attribution on the tunnelled v5e (2^13 config, warm XLA
    # cache): Python TRACING of the fused pipeline is ~58 s, XLA compile is
    # served from the persistent cache, device load ~16 s.  jax.export
    # serialization caches the traced module on disk, so a warm start
    # deserializes StableHLO instead of re-running Python tracing.  The key
    # hashes the package source, the AIR schema repr (frozen-dataclass IR —
    # value-based, deterministic), and every config knob that shapes the
    # program.  GENSTARK_EXPORT_CACHE=0 disables.
    def _export_key(self, name: str) -> str:
        import glob
        import hashlib
        import os
        h = hashlib.sha256()
        pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        for fn in sorted(glob.glob(os.path.join(pkg, "**", "*.py"),
                                   recursive=True)):
            with open(fn, "rb") as fh:
                h.update(fh.read())
        context = self.context
        idx_gen = self.stark.index_generator
        h.update(repr((
            name, jax.__version__, jax.default_backend(),
            self.field.modulus, context.trace_length, self.Ne,
            context.extension_factor, repr(context.schema),
            tuple(context.input_shapes),
            tuple((a.step, a.register) for a in self.assertions),
            idx_gen.exe_query_count, idx_gen.fri_query_count,
            self.hash.algorithm, self._trace_scan_nseg, self._split,
            self._chunk_elems, self._unchunk_ne,
            sorted((k, v) for k, v in os.environ.items()
                   if k.startswith("GENSTARK_")),
        )).encode())
        return h.hexdigest()[:32]

    def _export_cached(self, name: str, fn):
        """A jit-like callable backed by the on-disk jax.export cache.
        Falls back to plain jax.jit on any export/deserialize failure
        (version skew, unexported primitives) — correctness never depends
        on the cache."""
        import os
        if os.environ.get("GENSTARK_EXPORT_CACHE") == "0" or \
                self.mesh is not None:
            return jax.jit(fn)
        cache_dir = os.environ.get(
            "GENSTARK_EXPORT_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache",
                         "genstark_export"))
        state = {"call": None}

        def wrapper(*args):
            if state["call"] is not None:
                return state["call"](*args)
            path = os.path.join(cache_dir, f"{name}-{self._export_key(name)}")
            try:
                with open(path, "rb") as fh:
                    exp = jax.export.deserialize(fh.read())
                state["call"] = jax.jit(exp.call)
                return state["call"](*args)
            except FileNotFoundError:
                pass
            except Exception:
                pass                      # stale/corrupt blob: re-trace
            jitted = jax.jit(fn)
            try:
                exp = jax.export.export(
                    jitted,
                    disabled_checks=[
                        jax.export.DisabledSafetyCheck.custom_call(c)
                        for c in ("tpu_custom_call", "Sharding",
                                  "LayoutConstraint")])(*args)
                os.makedirs(cache_dir, exist_ok=True)
                tmp = path + ".tmp"
                with open(tmp, "wb") as fh:
                    fh.write(exp.serialize())
                os.replace(tmp, path)
                state["call"] = jax.jit(exp.call)
            except Exception:
                state["call"] = jitted    # export unsupported: plain jit
            return state["call"](*args)

        return wrapper

    def _run_stages(self, trace_dev, statics_parts, i_polys_np, marks):
        """Split-mode stage dispatch (A commit, B lcomb, C fri) with the
        inter-stage memory releases; returns the proof-tail inputs."""
        import os
        import time
        jit_a, jit_b, jit_c = self._jit_stages
        # GENSTARK_STAGE_TIMING forces a tiny fetch after each stage so
        # the marks attribute time per stage (costs 2 extra round-trips;
        # diagnostics only)
        stage_sync = (lambda x: np.asarray(jax.lax.slice(
            x.reshape(-1), (0,), (1,)))) if \
            os.environ.get("GENSTARK_STAGE_TIMING") else (lambda x: None)
        p_polys, static_polys, e_std, e_flat, e_root_dev = jit_a(
            trace_dev, statics_parts,
            self._get_pack(), self._get_mxund())
        stage_sync(e_flat)
        marks.append(("stage A (commit)", time.monotonic()))
        l_evals = jit_b(p_polys, static_polys, e_std,
                        self._put16(i_polys_np), e_root_dev,
                        self._get_pack(), self._get_mxund())
        stage_sync(l_evals)
        marks.append(("stage B (lcomb)", time.monotonic()))
        # free the full-domain stage inputs before the FRI chain runs
        del p_polys, static_polys
        fri_cat, vals_cat, fri_roots, _ = jit_c(
            l_evals, self._get_pack(), self._get_mxund())
        del l_evals
        return e_flat, fri_cat, e_std, vals_cat, e_root_dev, fri_roots

    def prove(self, trace_std: np.ndarray) -> StarkProof:
        import os
        import time
        timing = os.environ.get("GENSTARK_TIMING")
        marks = [("start", time.monotonic())]

        # start the trace transfer FIRST: device_put is asynchronous, so the
        # ~40 MB/s tunnel copy (the largest fixed cost at big trace lengths)
        # overlaps the host-side statics/interpolant prep below.  In
        # checkpoint-scan mode only every K-th state ships (see __init__)
        # and stage A re-derives the rest on device.
        if self._trace_scan_nseg:
            K = self.context.trace_length // self._trace_scan_nseg
            trace_std = np.ascontiguousarray(trace_std[:, :, ::K])
        trace_dev = self._put16(trace_std)
        statics_full, statics_cycs = self._statics_std()
        statics_parts = (self._put16(statics_full),
                         tuple(self._put16(c) for c in statics_cycs))
        i_polys_np = self.c_poly.b_poly.i_polys_std()
        marks.append(("host prep", time.monotonic()))

        from ..parallel.distributed import fetch
        stage_out = None
        # One-fetch proof: the transcript sampling + proof planning + gather
        # run IN-PROGRAM (_packed_tail), so there is no mid-proof
        # device->host sync at all.  GENSTARK_ONE_DISPATCH=0 disables; mesh
        # mode keeps the host-sampled path (its pinned-bytes dryruns cover
        # the collective surface, not the sampling kernels).
        if os.environ.get("GENSTARK_ONE_DISPATCH") != "0" and \
                self.mesh is None:
            if self._split:
                stage_out = self._run_stages(trace_dev, statics_parts,
                                             i_polys_np, marks)
                if self._jit_tail is None:
                    self._jit_tail = self._export_cached(
                        "packed_tail", self._packed_tail)
                packed_np = fetch(self._jit_tail(
                    stage_out[0], stage_out[1], stage_out[3], stage_out[2],
                    stage_out[4], stage_out[5]))
            else:
                if self._jit_packed is None:
                    self._jit_packed = self._export_cached(
                        "pipeline_packed", self._pipeline_packed)
                packed_np = fetch(self._jit_packed(
                    trace_dev, statics_parts, self._put16(i_polys_np),
                    self._get_pack(), self._get_mxund()))
            marks.append(("pipeline+packed fetch", time.monotonic()))
            proof = self._assemble_device_sampled(packed_np, marks, timing)
            if proof is not None:
                return proof
            # device sampling disagreed with the host's (candidate window
            # exhausted, or the sampler's unmodeled hex-length corner):
            # fall back to the host-sampled two-dispatch path below

        if stage_out is None:
            if self._split:
                stage_out = self._run_stages(trace_dev, statics_parts,
                                             i_polys_np, marks)
            else:
                if self._jit is None:
                    self._jit = self._export_cached("pipeline",
                                                    self._pipeline)
                e_flat_, fri_cat_, e_std_, vals_cat_, roots_cat, _ = \
                    self._jit(trace_dev, statics_parts,
                              self._put16(i_polys_np), self._get_pack(),
                              self._get_mxund())
                stage_out = (e_flat_, fri_cat_, e_std_, vals_cat_,
                             roots_cat[0], roots_cat[1:])
        e_flat, fri_cat, e_std, vals_cat, e_root_dev, fri_roots = stage_out
        roots_np = np.concatenate(
            [fetch(e_root_dev)[None], fetch(fri_roots)],
            axis=0).astype("<u4")
        marks.append(("pipeline+roots sync", time.monotonic()))
        root_bytes = [roots_np[i].tobytes() for i in range(roots_np.shape[0])]
        hp = self._host_plans(root_bytes)
        marks.append(("host transcript+plans", time.monotonic()))
        packed = fetch(self._packed_gather(
            e_flat, fri_cat, vals_cat, e_std, jnp.asarray(hp["rows_e_pad"]),
            jnp.asarray(hp["rows_f_pad"]), jnp.asarray(hp["cols_pad"]),
            jnp.asarray(hp["e_pad"])))
        marks.append(("packed gather+transfer", time.monotonic()))
        return self._assemble(packed, hp, root_bytes, marks, timing)

    def _tail_layout(self):
        """(offset, lengths) of the checks+roots tail _packed_tail appends
        after the four gather sections."""
        capRe, capRf, capC, capE = self._caps
        L = self.field.device.L
        V = self.context.schema.trace_width + len(self.secret_idx)
        base = capRe * 8 + capRf * 8 + L * capC + V * L * capE
        idx_gen = self.stark.index_generator
        exe_count = min(idx_gen.exe_query_count,
                        self.Ne - self.Ne // self.context.extension_factor)
        secs = [exe_count, 1]
        for _ in self.layer_sizes:
            secs += [idx_gen.fri_query_count, 1]
        n_roots = (2 + len(self.layer_sizes)) * 8
        return base, secs, n_roots

    def _assemble_device_sampled(self, packed, marks, timing):
        """Parse a _packed_tail buffer: recover the roots, re-derive the
        host transcript, verify the device sampling matches it, and
        assemble.  Returns None when the device sampling must be
        discarded (caller falls back to the host-sampled path)."""
        import time
        import os
        base, secs, n_roots = self._tail_layout()
        tail = packed[base:]
        roots_np = tail[sum(secs):sum(secs) + n_roots].astype("<u4")
        root_bytes = [roots_np[8 * i:8 * (i + 1)].tobytes()
                      for i in range(n_roots // 8)]
        off = 0
        dev_secs = []
        for ln in secs:
            dev_secs.append(tail[off:off + ln].astype(np.int64))
            off += ln
        n_sets = len(secs) // 2
        if any(int(dev_secs[2 * k + 1][0]) != secs[2 * k]
               for k in range(n_sets)):
            return None              # candidate-window exhaustion: fall back
        dev_positions = [[int(v) for v in dev_secs[2 * k]]
                         for k in range(n_sets)]
        if os.environ.get("GENSTARK_CHECK_SAMPLING"):
            # debug: re-derive on host and require equality (the samplers
            # are bit-exact by construction and by tests/test_device_queries;
            # a disagreement here would anyway just fail verification — the
            # verifier re-derives positions itself — never soundness)
            idx_gen = self.stark.index_generator
            want = [idx_gen.get_exe_indexes(root_bytes[1], self.Ne)]
            for i, n in enumerate(self.layer_sizes):
                want.append(idx_gen.get_fri_indexes(root_bytes[2 + i],
                                                    n // 4))
            if dev_positions != want:
                return None
        hp = self._host_plans(root_bytes, sampled=dev_positions)
        marks.append(("host transcript+plans", time.monotonic()))
        return self._assemble(packed, hp, root_bytes, marks, timing)

    def _host_plans(self, root_bytes, sampled=None):
        """Host transcript + batch-proof planning: positions, per-tree
        plans, and the padded gather index arrays — the exact host analog
        of _packed_tail's device derivation (shared by the fallback path
        and by proof assembly).  `sampled` (device-sampled positions:
        [exe, layer0, layer1, ...]) skips the host rejection sampling —
        worth ~5-10 ms, and much more for odd-hex transcript states where
        the host sampler iterates ~16x."""
        stark = self.stark
        Ne = self.Ne
        e_root = root_bytes[0]
        layer_roots = root_bytes[1:]                            # lc + columns

        # --- FRI host transcript: query positions per layer -------------------
        idx_gen = stark.index_generator
        lc_root = layer_roots[0]
        exe_positions = (sampled[0] if sampled is not None else
                         idx_gen.get_exe_indexes(lc_root, Ne))

        # per-tree proof plans (host bookkeeping, zero device traffic);
        # tree 0 rows live in e_flat, trees 1.. in the fri_cat buffer
        all_layers = self.layer_sizes + [self.remainder_size]
        tree_sizes = [Ne] + [n // 4 for n in all_layers]
        fri_offsets = np.cumsum([0] + [tree_row_count(n)
                                       for n in tree_sizes[1:]])
        plans = []          # (tree_index, positions, emissions, coords)

        def plan(tree_index, positions):
            depth = tree_sizes[tree_index].bit_length() - 1
            emissions, coords = plan_batch(positions, depth)
            plans.append((tree_index, positions, depth, emissions, coords))
            return len(plans) - 1

        augmented_positions = stark._get_augmented_positions(exe_positions, Ne)
        e_plan = plan(0, augmented_positions)
        lc_aug = get_augmented_positions(exe_positions, Ne)
        lc_plan = plan(1, lc_aug)

        comp_plans = []     # (col_positions, col_aug, col_plan, poly_plan)
        for i, n in enumerate(self.layer_sizes):
            column_length = n // 4
            positions = (sampled[1 + i] if sampled is not None else
                         idx_gen.get_fri_indexes(layer_roots[i + 1],
                                                 column_length))
            augmented = get_augmented_positions(positions, column_length)
            col_plan = plan(i + 2, augmented)   # tree of layer i+1
            poly_plan = plan(i + 1, positions)  # tree of layer i
            comp_plans.append((positions, augmented, col_plan, poly_plan))

        # --- ONE packed gather + ONE transfer for every proof byte ------------
        # Index arrays are padded to structure-level caps so the gather
        # program has fixed shapes (one compile per Stark config).
        rows_e, rows_f = [], []
        for tree_index, _, _, _, coords in plans:
            n = tree_sizes[tree_index]
            if tree_index == 0:
                rows_e += [_level_offset(n, level) + idx
                           for level, idx in coords]
            else:
                base = int(fri_offsets[tree_index - 1])
                rows_f += [base + _level_offset(n, level) + idx
                           for level, idx in coords]

        e_idx = augmented_positions
        layer_col_offsets = np.cumsum([0] + list(all_layers))
        # remainder occupies a FIXED prefix of the column-index section
        rem_base = int(layer_col_offsets[-2])
        val_idx = list(range(rem_base, rem_base + self.remainder_size))
        lc_rows = [(0, lc_aug)]
        for i, (positions, augmented, _, _) in enumerate(comp_plans):
            lc_rows.append((i + 1, augmented))      # column values (layer i+1)
            lc_rows.append((i, positions))          # poly row values (layer i)
        for layer, rows in lc_rows:
            m = all_layers[layer] // 4
            base = int(layer_col_offsets[layer])
            val_idx += [base + r + j * m for r in rows for j in range(4)]

        capRe, capRf, capC, capE = self._caps
        rows_e_pad = np.zeros(capRe, dtype=np.int32)
        rows_e_pad[:len(rows_e)] = rows_e
        rows_f_pad = np.zeros(capRf, dtype=np.int32)
        rows_f_pad[:len(rows_f)] = rows_f
        cols_pad = np.zeros(capC, dtype=np.int32)
        cols_pad[:len(val_idx)] = val_idx
        e_pad = np.zeros(capE, dtype=np.int32)
        e_pad[:len(e_idx)] = e_idx
        return {
            "e_root": e_root, "layer_roots": layer_roots, "lc_root": lc_root,
            "exe_positions": exe_positions,
            "augmented_positions": augmented_positions, "lc_aug": lc_aug,
            "plans": plans, "comp_plans": comp_plans, "e_plan": e_plan,
            "lc_plan": lc_plan, "rows_e": rows_e, "rows_f": rows_f,
            "val_idx": val_idx, "e_idx": e_idx, "rows_e_pad": rows_e_pad,
            "rows_f_pad": rows_f_pad, "cols_pad": cols_pad, "e_pad": e_pad,
        }

    def _assemble(self, packed, hp, root_bytes, marks, timing) -> StarkProof:
        """Unpack a packed gather buffer (host- or device-indexed — same
        prefix layout) into the StarkProof, using _host_plans' schedule."""
        context = self.context
        field = self.field
        elem = field.element_size
        import time
        capRe, capRf, capC, capE = self._caps
        L = self.field.device.L
        V = context.schema.trace_width + len(self.secret_idx)
        plans = hp["plans"]
        rows_e, rows_f = hp["rows_e"], hp["rows_f"]
        val_idx, e_idx = hp["val_idx"], hp["e_idx"]
        lc_aug, comp_plans = hp["lc_aug"], hp["comp_plans"]
        e_plan, lc_plan = hp["e_plan"], hp["lc_plan"]
        e_root, layer_roots = hp["e_root"], hp["layer_roots"]
        lc_root = hp["lc_root"]

        re_sec = packed[:capRe * 8].reshape(capRe, 8).astype("<u4")
        off = capRe * 8
        rf_sec = packed[off:off + capRf * 8].reshape(capRf, 8).astype("<u4")
        off += capRf * 8
        cols_sec = packed[off:off + L * capC].reshape(L, capC)
        off += L * capC
        evals_sec = packed[off:off + V * L * capE].reshape(V, L, capE)

        fetched_e = [re_sec[i].tobytes() for i in range(len(rows_e))]
        fetched_f = [rf_sec[i].tobytes() for i in range(len(rows_f))]
        proofs = []
        off_e = off_f = 0
        for tree_index, positions, depth, emissions, coords in plans:
            if tree_index == 0:
                chunk = fetched_e[off_e:off_e + len(coords)]
                off_e += len(coords)
            else:
                chunk = fetched_f[off_f:off_f + len(coords)]
                off_f += len(coords)
            proofs.append(assemble_batch(positions, depth, emissions, chunk))

        all_col_ints = limbs_to_ints(cols_sec[:, :len(val_idx)])
        remainder = all_col_ints[:self.remainder_size]
        val_ints = all_col_ints[self.remainder_size:]

        # remainder degree check during proving (LowDegreeProver.ts:183)
        f = field.host
        last_rou = f.exp(context.root_of_unity, 4 ** len(self.layer_sizes))
        max_deg = self.c_poly.composition_degree
        ld_prover = LowDegreeProver(self.stark.index_generator, self.hash,
                                    context)
        ld_prover.verify_remainder(
            remainder, max_deg // (4 ** len(self.layer_sizes)), last_rou)

        n_ei = len(e_idx)
        ev_ints = limbs_to_ints(np.moveaxis(
            evals_sec[:, :, :n_ei], 1, 0).reshape(L, V * n_ei))  # [v*n + i]
        e_values = [b"".join(ev_ints[v * n_ei + i].to_bytes(elem, "little")
                             for v in range(V)) for i in range(n_ei)]

        def take_rows(count):
            nonlocal val_ints
            chunk, val_ints = val_ints[:4 * count], val_ints[4 * count:]
            return [b"".join(chunk[4 * i + j].to_bytes(elem, "little")
                             for j in range(4)) for i in range(count)]

        lc_proof = proofs[lc_plan]
        lc_proof.values = take_rows(len(lc_aug))
        components = []
        for i, (positions, augmented, col_plan, poly_plan) in enumerate(comp_plans):
            column_proof = proofs[col_plan]
            column_proof.values = take_rows(len(augmented))
            poly_proof = proofs[poly_plan]
            poly_proof.values = take_rows(len(positions))
            components.append(FriComponent(column_root=layer_roots[i + 1],
                                           column_proof=column_proof,
                                           poly_proof=poly_proof))

        ld_proof = LowDegreeProof(lc_root=lc_root, lc_proof=lc_proof,
                                  components=components, remainder=remainder)

        e_proof = proofs[e_plan]
        e_proof.values = e_values
        if timing:
            marks.append(("host assembly", time.monotonic()))
            import sys
            print("[fused prove] " + " | ".join(
                f"{marks[i + 1][0]} {marks[i + 1][1] - marks[i][1]:.3f}s"
                for i in range(len(marks) - 1)), file=sys.stderr, flush=True)
        return StarkProof(ev_root=e_root, ev_proof=e_proof, ld_proof=ld_proof,
                          i_shapes=context.input_shapes)

    def _statics_std(self) -> tuple:
        """Static-register columns for upload, cyclic-compressed: registers
        with a periodic pattern (cycle / mask registers) upload ONE period
        and are tiled to trace length in-program (_assemble_statics) — at
        2^20 steps a cyclic register's column is 16 MB over a ~40 MB/s
        tunnel, its pattern a few KB.  Input-driven registers upload full.
        Returns (full [K_f, L, T], (pattern [L, p_k], ...)); the register
        order is recorded in self._static_plan at first use."""
        context = self.context
        L = self.field.device.L
        K = len(context.schema.static_registers)
        T = context.trace_length
        plan = []
        full, cycs = [], []
        for k in range(K):
            pattern = context._cyclic_pattern(k)
            if pattern is not None and len(pattern) < T and \
                    T % len(pattern) == 0:
                plan.append("cyc")
                cycs.append(ints_to_limbs(pattern, L))
            else:
                plan.append("full")
                # structural build: distinct values converted once, numpy
                # repeat/roll — never a per-element big-int pass over T
                full.append(context.static_column_limbs(k, L))
        self._static_plan = tuple(plan)
        full_arr = (np.stack(full) if full
                    else np.zeros((0, L, T), dtype=np.uint32))
        return full_arr, tuple(cycs)

    def _assemble_statics(self, statics_parts) -> jnp.ndarray:
        """Traced: (full, cycs) u16 upload parts -> [K, L, T] u32 standard-
        form static columns in register order (see _statics_std)."""
        assert self._static_plan is not None, \
            "_statics_std() must build the upload parts first"
        full, cycs = statics_parts
        T = self.context.trace_length
        L = self.field.device.L
        cols = []
        fi = ci = 0
        for kind in self._static_plan:
            if kind == "full":
                cols.append(full[fi].astype(jnp.uint32))
                fi += 1
            else:
                pat = cycs[ci].astype(jnp.uint32)
                ci += 1
                cols.append(jnp.tile(pat, (1, T // pat.shape[-1])))
        if not cols:
            return jnp.zeros((0, L, T), dtype=jnp.uint32)
        return jnp.stack(cols)


