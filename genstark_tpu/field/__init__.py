"""Finite-field layer (L1 of SURVEY.md's layer map).

`PrimeField` is the facade that the protocol engine talks to — the TPU-native
equivalent of `@guildofweavers/galois`'s FiniteField surface consumed by the
reference (SURVEY.md section 1, L1; /root/reference/lib/Stark.ts:106-109).
Batch ops live on device (`DeviceField`, Montgomery limbs); scalar and
coefficient-form ops live on host (`HostField`, python ints).
"""

from __future__ import annotations

from functools import lru_cache

from .limbs import MontParams, element_size_for, limb_count_for
from .host import HostField
from .device import DeviceField

# Fields used by the reference's examples (SURVEY.md section 2.3)
P32 = 2**32 - 3 * 2**25 + 1        # README "Foo" demo, fibonacci
P64 = 2**64 - 21 * 2**30 + 1       # rescue hash2x64
P128 = 2**128 - 9 * 2**32 + 1      # mimc128, rescue 4x128, poseidon, assembly lib128
P224 = 2**224 - 2**96 + 1          # secp224r1 base field: pointmul, lib224
P256 = 2**256 - 351 * 2**32 + 1    # mimc256


class PrimeField:
    """A prime field with host and device backends.

    The element interchange type at API boundaries is python int (standard
    form); device arrays are uint32[L, N] limb arrays in Montgomery form.
    """

    def __init__(self, modulus: int):
        self.modulus = modulus
        self.params = MontParams(modulus)
        self.host = HostField(modulus)
        self.device = DeviceField(self.params)

    # properties mirroring the galois surface
    @property
    def element_size(self) -> int:
        return self.params.element_size

    @property
    def characteristic(self) -> int:
        return self.modulus

    @property
    def is_optimized(self) -> bool:
        return True  # device kernels cover every modulus

    @property
    def one(self) -> int:
        return 1

    @property
    def zero(self) -> int:
        return 0

    def __repr__(self):
        return f"PrimeField(2^{self.modulus.bit_length() - 1}-ish, {self.modulus})"

    # scalar ops delegate to host
    def add(self, a, b): return self.host.add(a, b)
    def sub(self, a, b): return self.host.sub(a, b)
    def mul(self, a, b): return self.host.mul(a, b)
    def div(self, a, b): return self.host.div(a, b)
    def neg(self, a): return self.host.neg(a)
    def exp(self, a, e): return self.host.exp(a, e)
    def inv(self, a): return self.host.inv(a)
    def rand(self):
        import secrets
        return secrets.randbelow(self.modulus)

    def prng(self, seed: bytes, count: int = None):
        return self.host.prng(seed, count)

    def get_root_of_unity(self, n: int) -> int:
        return self.host.get_root_of_unity(n)

    def get_power_series(self, seed: int, length: int):
        return self.host.get_power_series(seed, length)

    # serialization of a single element (LE bytes, reference wire format:
    # /root/reference/lib/utils/serialization.ts:131-147)
    def to_bytes(self, value: int) -> bytes:
        return int(value).to_bytes(self.element_size, "little")

    def from_bytes(self, data: bytes) -> int:
        return int.from_bytes(data, "little")


@lru_cache(maxsize=None)
def create_prime_field(modulus: int) -> PrimeField:
    """Create (and cache) a PrimeField for the given modulus."""
    return PrimeField(modulus)
