"""Native (C++) runtime components.

The reference's "native tier" is WASM compiled from AssemblyScript inside the
galois/merkle packages (SURVEY.md §2.2).  Batched domain-wide math belongs on
the TPU; the one inherently *serial* hot loop — execution-trace generation,
the reference's generated-JS `generateExecutionTrace`
(/root/reference/lib/Stark.ts:97) — belongs in native host code.  This package
code-generates a C++ translation unit per (AIR schema, modulus), compiles it
with g++ into a shared object (cached by source hash), and calls it through
ctypes.  Falls back to the pure-Python interpreter when no toolchain exists.
"""

from .tracegen import NativeUnavailable, native_trace_fn

__all__ = ["native_trace_fn", "NativeUnavailable"]
