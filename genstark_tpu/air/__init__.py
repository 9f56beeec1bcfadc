from .ir import (AirSchema, Const, CyclicRegister, Expr, InputRegister,
                 MaskRegister, const, nxt, seed, static, trace)
from .module import AirModule
