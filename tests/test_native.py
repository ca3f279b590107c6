"""Native (C++) mesh graph builder: equivalence with the numpy fallback.
Skipped when no C++ toolchain is available."""

import numpy as np
import pytest

from thetis_tpu.native import get_meshbuild


@pytest.mark.skipif(get_meshbuild() is None, reason="no C++ toolchain")
def test_native_facets_match_numpy(monkeypatch):
    from thetis_tpu import RectangleMesh, FunctionSpace, Function, DGAssembler

    m1 = RectangleMesh(17, 9, 4.0, 3.0)  # native (default)
    monkeypatch.setenv("THETIS_TPU_NATIVE", "0")
    m2 = RectangleMesh(17, 9, 4.0, 3.0)  # numpy
    assert m1.nf == m2.nf
    assert abs(m1.total_area - m2.total_area) < 1e-12
    assert sorted(map(tuple, np.sort(m1.facet_verts_np, 1).tolist())) == \
        sorted(map(tuple, np.sort(m2.facet_verts_np, 1).tolist()))
    assert m1.boundary_len == m2.boundary_len
    monkeypatch.delenv("THETIS_TPU_NATIVE")

    # topology consistency on the native-built mesh
    V = FunctionSpace(m1, "DG", 1)
    asm = DGAssembler(m1, V)
    f = Function(V).interpolate(lambda x, y: 1 + 2 * x - y)
    tr = np.asarray(asm.facet_traces(f.data))
    interior = ~m1.facet_is_boundary_np
    assert np.abs(tr[interior, 0] - tr[interior, 1]).max() < 1e-12
    n, L = m1.facet_normal_np, m1.facet_len_np
    cf, cs = m1.cell_facets_np, m1.cell_sides_np
    sgn = np.where(cs == 0, 1.0, -1.0)
    per_cell = (n[cf] * L[cf][..., None] * sgn[..., None]).sum(axis=1)
    assert np.abs(per_cell).max() < 1e-12
