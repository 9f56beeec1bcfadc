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


def _load_source(source: Union[str, bytes]) -> tuple:
    """Source text from text / bytes / filesystem path (the reference accepts
    all three — /root/reference/index.ts:18-45).  Returns (text, base_path)."""
    import os
    if isinstance(source, bytes):
        return source.decode(), None
    if "\n" not in source and os.path.isfile(source):
        with open(source) as fh:
            return fh.read(), os.path.dirname(os.path.abspath(source))
    return source, None


def instantiate(schema: Union[AirSchema, str, bytes], component: str = "default",
                options: Optional[dict] = None,
                logger: Optional[Logger] = None) -> Stark:
    """Create a Stark from an AirSchema, AirAssembly source text/bytes, or a
    path to a .aa file."""
    options = options or {}
    if isinstance(schema, (str, bytes)):
        from .air.assembly import compile_assembly
        source, _ = _load_source(schema)
        schema = compile_assembly(source, component)
    air = AirModule(schema, extension_factor=options.get("extension_factor"))
    return Stark(air, options, logger)


def instantiate_script(source: Union[str, bytes], options: Optional[dict] = None,
                       logger: Optional[Logger] = None,
                       base_path: Optional[str] = None) -> Stark:
    """Create a Stark from AirScript source text/bytes or a path.  `base_path`
    resolves relative AirAssembly import paths (/root/reference/index.ts:35-45);
    when the source is given as a path it defaults to the file's directory."""
    from .air.script import compile_script
    text, file_dir = _load_source(source)
    schema = compile_script(text, base_path or file_dir)
    return instantiate(schema, "default", options, logger)
