"""genstark_tpu — a TPU-native zk-STARK proving framework.

Public API mirroring the reference's factory surface
(/root/reference/index.ts:18-45):

- `instantiate(schema_or_source, component, options, logger)` — build a Stark
  from an AirSchema (python API) or AirAssembly source text.
- `instantiate_script(source, options, logger)` — build a Stark from
  AirScript source text.
"""

from __future__ import annotations

from typing import Optional, Union

from .air import AirModule, AirSchema
from .field import create_prime_field
from .protocol import Assertion, Stark, StarkError, StarkProof
from .utils import Logger, noop_logger

__version__ = "0.1.0"


def instantiate(schema: Union[AirSchema, str, bytes], component: str = "default",
                options: Optional[dict] = None,
                logger: Optional[Logger] = None) -> Stark:
    """Create a Stark from an AirSchema or AirAssembly source."""
    options = options or {}
    if isinstance(schema, (str, bytes)):
        from .air.assembly import compile_assembly
        source = schema.decode() if isinstance(schema, bytes) else schema
        schema = compile_assembly(source, component)
    air = AirModule(schema, extension_factor=options.get("extension_factor"))
    return Stark(air, options, logger)


def instantiate_script(source: Union[str, bytes], options: Optional[dict] = None,
                       logger: Optional[Logger] = None,
                       base_path: Optional[str] = None) -> Stark:
    """Create a Stark from AirScript source.  `base_path` resolves relative
    AirAssembly import paths (/root/reference/index.ts:35-45)."""
    from .air.script import compile_script
    text = source.decode() if isinstance(source, bytes) else source
    schema = compile_script(text, base_path)
    return instantiate(schema, "default", options, logger)
