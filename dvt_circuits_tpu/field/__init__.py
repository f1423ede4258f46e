from . import babybear
from .babybear import (
    P as BABYBEAR_P,
    add,
    from_mont,
    mont_mul,
    mul,
    neg,
    sub,
    to_mont,
)
