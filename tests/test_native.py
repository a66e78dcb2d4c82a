"""Native C++ table generator vs the pure-Python oracle — outputs must be
bit-identical (the modular inverse is unique)."""

import numpy as np
import pytest

from matrix_fhe_tpu.config import get_params
from matrix_fhe_tpu.native import tablegen
from matrix_fhe_tpu.ops.modmath import find_eta, find_psi_4n
from matrix_fhe_tpu.tables import (cyclotomic_two_primes, lagrange_inverse_mod,
                                   vandermonde_mod)

pytestmark = pytest.mark.skipif(not tablegen.available(),
                                reason="no native toolchain")


@pytest.mark.parametrize("preset", ["tiny", "small"])
def test_native_matches_python(preset):
    p = get_params(preset)
    f1, f2 = p.p_factors
    master = cyclotomic_two_primes(p.p, f1, f2)
    for q in p.moduli:
        eta = find_eta(q, p.p, f1, f2)
        roots = [pow(eta, e, q) for e in p.w_exponents]
        v_c, vi_c = tablegen.wcrt_tables(q, roots, master)
        v_py = vandermonde_mod(roots, q)
        vi_py = lagrange_inverse_mod(roots, master, q)
        assert (v_c == v_py).all()
        assert (vi_c == vi_py).all()


def test_native_root_searches():
    p = get_params("small")
    f1, f2 = p.p_factors
    for q in p.moduli:
        assert tablegen.find_eta(q, p.p, f1, f2) == find_eta(q, p.p, f1, f2)
        assert tablegen.find_psi4n(q, p.n) == find_psi_4n(q, p.n)


def test_native_ref_limb0_speed():
    """Full phi=512 limb via C++ — should be well under a second."""
    import time
    p = get_params("ref")
    f1, f2 = p.p_factors
    q = p.moduli[0]
    master = cyclotomic_two_primes(p.p, f1, f2)
    eta = find_eta(q, p.p, f1, f2)
    roots = [pow(eta, e, q) for e in p.w_exponents]
    t0 = time.time()
    v, vi = tablegen.wcrt_tables(q, roots, master)
    dt = time.time() - t0
    prod = (v.astype(object) @ vi.astype(object)) % q
    assert (prod == np.eye(512, dtype=object)).all()
    assert dt < 5.0, dt
