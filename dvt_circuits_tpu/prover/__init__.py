from .pipeline import (
    ProveError,
    VerifyError,
    execute_circuit,
    load_proof,
    prove_circuit,
    save_proof,
    verify_proof,
)
