"""Multi-process (multi-host analog) dryrun of the sharded prover.

Launches TWO OS processes, each forcing the CPU backend with 4 virtual
devices, joined into one jax.distributed group -> an 8-device global mesh
whose cross-process collectives run over Gloo/TCP (the DCN analog; see
genstark_tpu/parallel/distributed.py for the real 2-host launch recipe).
Each process runs the FULL sharded prover over the global mesh and asserts
the proof bytes equal its own single-device proof; the parent records the
result in DISTRIBUTED_r03.json at the repo root.

Usage:  python scripts/dist_dryrun.py            (parent; spawns children)
        python scripts/dist_dryrun.py --child I --port P   (internal)
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_NPROC = 2
_LOCAL_DEVICES = 4


def child(process_id: int, port: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_cpu_use_fusion_emitters" not in flags:
        os.environ["XLA_FLAGS"] = (flags +
                                   " --xla_cpu_use_fusion_emitters=false").strip()
    sys.path.insert(0, _REPO)
    import jax
    jax.config.update("jax_platforms", "cpu")
    from genstark_tpu.parallel import distributed
    distributed.initialize(f"localhost:{port}", num_processes=_NPROC,
                           process_id=process_id,
                           local_device_count=_LOCAL_DEVICES)
    assert jax.process_count() == _NPROC
    n_global = len(jax.devices())
    assert n_global == _NPROC * _LOCAL_DEVICES

    from examples.mimc import make_mimc_stark, run_mimc
    from genstark_tpu.field import P32, P128
    from genstark_tpu.protocol import Assertion

    # Two passes, mirroring dryrun_multichip: P32 at a config with a FRI
    # fold (full collective coverage) and P128 (8 x 16-bit limbs through the
    # cross-process all-to-all NTT, sharded hash, one fold).  Both assert
    # byte-identity against a live single-device proof in every process.
    configs = [
        ("p32", P32, 128, 16,
         {"extension_factor": 4, "exe_query_count": 12, "fri_query_count": 8}),
        ("p128", P128, 128, 16,
         {"extension_factor": 4, "exe_query_count": 8, "fri_query_count": 6}),
    ]
    for name, modulus, steps, n_const, options in configs:
        stark, constants = make_mimc_stark(steps, modulus=modulus,
                                           use_input=False,
                                           constant_count=n_const,
                                           options=options)
        field = stark.air.field
        controls = run_mimc(field, steps, constants, 3)
        assertions = [Assertion(0, 0, controls[0]),
                      Assertion(steps - 1, 0, controls[-1])]

        single = stark.serialize(stark.prove(assertions, [], [3]))

        stark.set_mesh(distributed.global_mesh())
        proof = stark.prove(assertions, [], [3])
        assert stark.verify(assertions, proof), \
            f"distributed {name} proof failed verify"
        sharded = stark.serialize(proof)
        assert sharded == single, \
            f"distributed {name} proof bytes != single-device"
        print(f"child {process_id}: {name} OK — {len(sharded)} proof bytes "
              f"over {n_global} devices in {_NPROC} processes", flush=True)


def main() -> None:
    if "--child" in sys.argv:
        i = sys.argv.index("--child")
        child(int(sys.argv[i + 1]), int(sys.argv[sys.argv.index("--port") + 1]))
        return

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    t0 = time.monotonic()
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--child", str(i),
         "--port", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(_NPROC)]
    outs = []
    ok = True
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=3000)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            ok = False
        outs.append(out)
        ok = ok and p.returncode == 0
        sys.stderr.write(f"--- child {i} (rc={p.returncode}) ---\n{out}\n")
    result = {
        "ok": ok,
        "processes": _NPROC,
        "devices_per_process": _LOCAL_DEVICES,
        "seconds": round(time.monotonic() - t0, 1),
        "what": "full sharded prover (p32 with FRI fold + p128 multi-limb) "
                "over a 2-process jax.distributed CPU mesh (Gloo "
                "collectives); proof bytes byte-identical to single-device "
                "in every process",
        "children": ["\n".join(ln for ln in o.strip().splitlines()
                               if " OK " in ln.replace("—", " "))
                     or "\n".join(o.strip().splitlines()[-3:]) for o in outs],
    }
    out_path = os.environ.get("DIST_DRYRUN_OUT",
                              os.path.join(_REPO, "DISTRIBUTED_r05.json"))
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps({"ok": ok, "seconds": result["seconds"]}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
