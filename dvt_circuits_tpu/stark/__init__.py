from .air import Air
from .config import StarkConfig
from .prover import prove
from .verifier import StarkError, verify
