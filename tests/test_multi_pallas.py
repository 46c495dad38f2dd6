"""Fused K-component Shan-Chen kernel vs the XLA multigrid engine."""
import sys

import pytest

import numpy as np

sys.path.insert(0, 'examples')
sys.path.insert(0, 'examples/binary_fluid')

from sailfish_tpu.controller import LBSimulationController  # noqa: E402


def _run(cls, engine, dims, seed=42):
    np.random.seed(seed)
    ctrl = LBSimulationController(cls, default_config=dict(
        quiet=True, engine=engine, **dims))
    ctrl.run(ignore_cmdline=True)
    r = ctrl._runner
    r._fields_to_host()
    return r.engine, np.array(r.sim.rho), np.array(r.sim.phi)


@pytest.mark.slow
def test_binary_sc_fused_matches_xla():
    """Cross-coupled binary separation (linear potential)."""
    from sc_separation_2d import SeparationSCSim
    dims = dict(lat_nx=128, lat_ny=128, max_iters=25, every=25)
    _, rho_a, phi_a = _run(SeparationSCSim, 'xla', dims)
    engine, rho_b, phi_b = _run(SeparationSCSim, 'pallas', dims)
    assert engine == 'pallas'
    assert np.max(np.abs(rho_a - rho_b)) < 5e-6
    assert np.max(np.abs(phi_a - phi_b)) < 5e-6


@pytest.mark.slow
def test_binary_sc_fused_walls_and_gravity():
    """Rayleigh-Taylor: walls (in-kernel mask) + per-component body
    force through the fused multi kernel."""
    from sc_rayleigh_taylor_2d import RayleighTaylorSCSim
    dims = dict(lat_nx=64, lat_ny=128, max_iters=25, every=25)
    _, rho_a, phi_a = _run(RayleighTaylorSCSim, 'xla', dims)
    engine, rho_b, phi_b = _run(RayleighTaylorSCSim, 'pallas', dims)
    assert engine == 'pallas'
    assert np.max(np.abs(rho_a - rho_b)) < 5e-6
    assert np.max(np.abs(phi_a - phi_b)) < 5e-6


@pytest.mark.slow
def test_ternary_sc_fused_matches_xla():
    """Three components, classic potential, self-couplings."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        'tern_drop', 'examples/ternary_fluid/sc_drop_2d.py')
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    dims = dict(lat_nx=64, lat_ny=64, max_iters=25, every=25)
    _, rho_a, phi_a = _run(m.TernaryDropSim, 'xla', dims)
    engine, rho_b, phi_b = _run(m.TernaryDropSim, 'pallas', dims)
    assert engine == 'pallas'
    assert np.max(np.abs(rho_a - rho_b)) < 5e-6
    assert np.max(np.abs(phi_a - phi_b)) < 5e-6


@pytest.mark.slow
def test_binary_fe_fused_matches_xla():
    """Free-energy separation (periodic) on the fused FE kernel."""
    from fe_separation_2d import SeparationFESim
    dims = dict(lat_nx=128, lat_ny=128, max_iters=25, every=25)
    _, rho_a, phi_a = _run(SeparationFESim, 'xla', dims)
    engine, rho_b, phi_b = _run(SeparationFESim, 'pallas', dims)
    assert engine == 'pallas'
    assert np.max(np.abs(rho_a - rho_b)) < 5e-6
    assert np.max(np.abs(phi_a - phi_b)) < 5e-6


@pytest.mark.slow
def test_binary_fe_mrt_fused_matches_xla():
    """FE-MRT collision (--model=mrt, the reference's recommended
    binary model) on the fused FE kernel: the moment-wise reformulated
    relaxation (pallas_multi2d.fe_mrt_relax) matches the XLA engine's
    dense projections to fp32 roundoff."""
    from fe_separation_2d import SeparationFESim
    dims = dict(lat_nx=128, lat_ny=128, max_iters=25, every=25,
                model='mrt', tau_a=3.0, tau_b=0.8)
    _, rho_a, phi_a = _run(SeparationFESim, 'xla', dims)
    engine, rho_b, phi_b = _run(SeparationFESim, 'pallas', dims)
    assert engine == 'pallas'
    assert np.max(np.abs(rho_a - rho_b)) < 5e-6
    assert np.max(np.abs(phi_a - phi_b)) < 5e-6


@pytest.mark.slow
def test_binary_fe_fused_walls_wetting_force():
    """Two-layer FE Poiseuille: walls + wetting mirror + body force +
    phi-interpolated tau through the fused kernel."""
    from fe_poiseuille_2d import FEPoiseuilleSim
    dims = dict(lat_nx=64, lat_ny=64, max_iters=25, every=25)
    _, rho_a, phi_a = _run(FEPoiseuilleSim, 'xla', dims)
    engine, rho_b, phi_b = _run(FEPoiseuilleSim, 'pallas', dims)
    assert engine == 'pallas'
    assert np.max(np.abs(rho_a - rho_b)) < 5e-6
    assert np.max(np.abs(phi_a - phi_b)) < 5e-6


@pytest.mark.slow
def test_binary_fe_fused_eq_force_map():
    """use_force_for_equilibrium overrides flow through the fused FE
    kernel (per-target equilibrium velocities)."""
    from sailfish_tpu.models.base import LBForcedSim
    from sailfish_tpu.models.binary import LBBinaryFluidFreeEnergy
    from sailfish_tpu.node_type import NTFullBBWall
    from sailfish_tpu.subdomain import Subdomain2D

    class Dom(Subdomain2D):
        def boundary_conditions(self, hx, hy):
            self.set_node((hy == 0) | (hy == self.gy - 1),
                          NTFullBBWall)

        def initial_conditions(self, sim, hx, hy):
            sim.rho[:] = 1.0
            sim.phi[:] = np.where(hx < self.gx / 2, 1.0, -1.0)

    class Sim(LBBinaryFluidFreeEnergy, LBForcedSim):
        subdomain = Dom

        @classmethod
        def update_defaults(cls, defaults):
            defaults.update(dict(
                tau_a=2.5, tau_b=0.7, tau_phi=1.0, kappa=0.04,
                A=0.04, Gamma=1.0, periodic_x=True))

        def __init__(self, config):
            super().__init__(config)
            self.add_body_force((1e-5, 0.0), grid=0)
            self.use_force_for_equilibrium(None, target_grid=0)
            self.use_force_for_equilibrium(0, target_grid=1)

    dims = dict(lat_nx=64, lat_ny=64, max_iters=25, every=25)
    _, rho_a, phi_a = _run(Sim, 'xla', dims)
    engine, rho_b, phi_b = _run(Sim, 'pallas', dims)
    assert engine == 'pallas'
    assert np.max(np.abs(rho_a - rho_b)) < 5e-6
    assert np.max(np.abs(phi_a - phi_b)) < 5e-6


# -- 3D fused multi-component kernels (ops/pallas_multi3d) -------------------

def _run3(cls, engine, dims, seed=42):
    np.random.seed(seed)
    ctrl = LBSimulationController(cls, default_config=dict(
        quiet=True, engine=engine, **dims))
    ctrl.run(ignore_cmdline=True)
    r = ctrl._runner
    r._fields_to_host()
    return r.engine, np.array(r.sim.rho), np.array(r.sim.phi)


@pytest.mark.slow
def test_binary_sc3d_fused_matches_xla():
    """3D binary SC demixing, fully periodic."""
    from sc_separation_3d import SeparationSCSim
    dims = dict(lat_nx=32, lat_ny=16, lat_nz=12, max_iters=20, every=20)
    _, rho_a, phi_a = _run3(SeparationSCSim, 'xla', dims)
    engine, rho_b, phi_b = _run3(SeparationSCSim, 'pallas', dims)
    assert engine == 'pallas'
    assert np.max(np.abs(rho_a - rho_b)) < 5e-6
    assert np.max(np.abs(phi_a - phi_b)) < 5e-6


@pytest.mark.slow
def test_binary_sc3d_emitted_rho_bitwise():
    """The in-kernel rho emission must be bit-identical to the
    pre-pass kernel recomputed from the carried state (the invariant
    the sharded edge-fixup path also relies on)."""
    import jax
    import numpy as np
    from sc_separation_3d import SeparationSCSim
    np.random.seed(7)
    ctrl = LBSimulationController(SeparationSCSim, default_config=dict(
        quiet=True, engine='pallas', lat_nx=32, lat_ny=16, lat_nz=12,
        max_iters=0, every=0))
    ctrl.run(ignore_cmdline=True)
    r = ctrl._runner
    p = r._pallas
    assert p.emit_rho
    carry = p.pad_state(r.f)
    carry = jax.lax.fori_loop(0, 5, lambda i, c: p.step(c, i), carry)
    fs, rhos = carry
    ref = p._post_stream_rhos(fs)
    for c in range(p.K):
        assert np.array_equal(np.asarray(rhos[c]), np.asarray(ref[c]))


@pytest.mark.slow
def test_binary_sc3d_fused_walls():
    """3D binary SC with bounce-back walls (in-kernel mask)."""
    from sc_separation_3d_walls import WalledSeparationSim
    dims = dict(lat_nx=32, lat_ny=16, lat_nz=12, max_iters=20, every=20)
    _, rho_a, phi_a = _run3(WalledSeparationSim, 'xla', dims)
    engine, rho_b, phi_b = _run3(WalledSeparationSim, 'pallas', dims)
    assert engine == 'pallas'
    assert np.max(np.abs(rho_a - rho_b)) < 5e-6
    assert np.max(np.abs(phi_a - phi_b)) < 5e-6


@pytest.mark.slow
def test_binary_fe3d_fused_matches_xla():
    """3D free-energy separation, fully periodic."""
    from fe_separation_3d import SeparationFESim3D
    dims = dict(lat_nx=32, lat_ny=16, lat_nz=12, max_iters=20, every=20)
    _, rho_a, phi_a = _run3(SeparationFESim3D, 'xla', dims)
    engine, rho_b, phi_b = _run3(SeparationFESim3D, 'pallas', dims)
    assert engine == 'pallas'
    assert np.max(np.abs(rho_a - rho_b)) < 5e-6
    assert np.max(np.abs(phi_a - phi_b)) < 5e-6


@pytest.mark.slow
def test_binary_fe3d_emitted_phi_bitwise():
    """In-kernel phi emission vs the pre-pass kernel, bit-exact."""
    import jax
    import numpy as np
    from fe_separation_3d import SeparationFESim3D
    np.random.seed(7)
    ctrl = LBSimulationController(SeparationFESim3D, default_config=dict(
        quiet=True, engine='pallas', lat_nx=32, lat_ny=16, lat_nz=12,
        max_iters=0, every=0))
    ctrl.run(ignore_cmdline=True)
    r = ctrl._runner
    p = r._pallas
    assert p.emit_phi
    carry = p.pad_state(r.f)
    carry = jax.lax.fori_loop(0, 5, lambda i, c: p.step(c, i), carry)
    (f0, f1), phi = carry
    ref = p._post_stream_phi(f1)
    assert np.array_equal(np.asarray(phi), np.asarray(ref))


@pytest.mark.slow
def test_binary_fe3d_fused_walls_wetting_force():
    """3D FE viscous fingering: walls + wetting mirror + body force +
    eq_force_map through the fused kernel."""
    from fe_viscous_fingering import FingeringFESim
    # the scene's reference default is FE-MRT (XLA-only); the fused
    # kernel covers the BGK collision
    dims = dict(lat_nx=32, lat_ny=16, lat_nz=12, max_iters=20, every=20,
                model='bgk')
    _, rho_a, phi_a = _run3(FingeringFESim, 'xla', dims)
    engine, rho_b, phi_b = _run3(FingeringFESim, 'pallas', dims)
    assert engine == 'pallas'
    assert np.max(np.abs(rho_a - rho_b)) < 5e-6
    assert np.max(np.abs(phi_a - phi_b)) < 5e-6


@pytest.mark.slow
def test_binary_fe3d_mrt_fingering_matches_xla():
    """The reference-faithful viscous-fingering scene (FE-MRT default,
    walls + wetting + forcing + eq_force_map) on the fused 3D kernel
    vs the XLA engine -- the round-4 gap where the reference's
    RECOMMENDED binary model fell off the fused path."""
    from fe_viscous_fingering import FingeringFESim
    dims = dict(lat_nx=32, lat_ny=16, lat_nz=12, max_iters=20, every=20)
    _, rho_a, phi_a = _run3(FingeringFESim, 'xla', dims)
    engine, rho_b, phi_b = _run3(FingeringFESim, 'pallas', dims)
    assert engine == 'pallas'
    assert np.max(np.abs(rho_a - rho_b)) < 5e-6
    assert np.max(np.abs(phi_a - phi_b)) < 5e-6


# -- z-sharded fused multi-component stepping (parallel/halo_multi) ----------
#
# The sharded fused path must be BITWISE equal to the single-device
# fused engine: the in-kernel emission covers the interior planes and
# the XLA edge fixup (stream_rho_edges) reproduces the wrap emission's
# exact summation order. This is the TPU analog of the reference
# NN-runner's two-phase macro exchange (subdomain_runner.py:2102).

def _run_sharded(cls, dims, mesh, seed=42):
    np.random.seed(seed)
    ctrl = LBSimulationController(cls, default_config=dict(
        quiet=True, engine='pallas', mesh=mesh, **dims))
    ctrl.run(ignore_cmdline=True)
    r = ctrl._runner
    state = r.f if isinstance(r.f, tuple) else (r.f,)
    return r, tuple(np.asarray(f) for f in state)


@pytest.mark.slow
def test_sharded_sc_multi_3d_bitwise():
    """Binary SC mixture on a 4-way z-mesh == single device, bitwise."""
    from sc_separation_3d import SeparationSCSim
    from sailfish_tpu.parallel.halo_multi import ShardedPallasSCMulti3D
    dims = dict(lat_nx=32, lat_ny=16, lat_nz=12, max_iters=15, every=15)
    _, fs_1 = _run_sharded(SeparationSCSim, dims, '')
    r, fs_n = _run_sharded(SeparationSCSim, dims, '4')
    assert isinstance(r._pallas, ShardedPallasSCMulti3D)
    for a, b in zip(fs_1, fs_n):
        assert np.array_equal(a, b)


@pytest.mark.slow
def test_sharded_sc_multi_3d_walls_bitwise():
    """Walls (in-kernel mask) + per-component gravity, sharded."""
    from sc_separation_3d_walls import WalledSeparationSim
    dims = dict(lat_nx=32, lat_ny=16, lat_nz=12, max_iters=15, every=15)
    _, fs_1 = _run_sharded(WalledSeparationSim, dims, '')
    _, fs_n = _run_sharded(WalledSeparationSim, dims, '4')
    for a, b in zip(fs_1, fs_n):
        assert np.array_equal(a, b)


@pytest.mark.slow
def test_sharded_fe_3d_bitwise():
    """Binary free energy on a 4-way z-mesh == single device, bitwise
    (the reach-2 phi stencil exchanges two planes per side)."""
    from fe_separation_3d import SeparationFESim3D
    from sailfish_tpu.parallel.halo_multi import ShardedPallasFE3D
    dims = dict(lat_nx=32, lat_ny=16, lat_nz=12, max_iters=15, every=15)
    _, fs_1 = _run_sharded(SeparationFESim3D, dims, '')
    r, fs_n = _run_sharded(SeparationFESim3D, dims, '4')
    assert isinstance(r._pallas, ShardedPallasFE3D)
    for a, b in zip(fs_1, fs_n):
        assert np.array_equal(a, b)


@pytest.mark.slow
def test_sharded_fe_3d_wetting_force_bitwise():
    """FE with walls + wetting mirror + body force, sharded; the
    static orientation neighbor faces cross shard boundaries."""
    from fe_viscous_fingering import FingeringFESim
    dims = dict(lat_nx=32, lat_ny=16, lat_nz=12, max_iters=15, every=15,
                model='bgk')
    _, fs_1 = _run_sharded(FingeringFESim, dims, '')
    _, fs_n = _run_sharded(FingeringFESim, dims, '4')
    for a, b in zip(fs_1, fs_n):
        assert np.array_equal(a, b)


@pytest.mark.slow
def test_sharded_fe_3d_mrt_bitwise():
    """The reference-default FE-MRT fingering scene sharded on a
    z-mesh == single-device fused, bitwise (the MRT relaxation is
    node-local, so the carries are untouched)."""
    from fe_viscous_fingering import FingeringFESim
    dims = dict(lat_nx=32, lat_ny=16, lat_nz=12, max_iters=15, every=15)
    _, fs_1 = _run_sharded(FingeringFESim, dims, '')
    _, fs_n = _run_sharded(FingeringFESim, dims, '4')
    for a, b in zip(fs_1, fs_n):
        assert np.array_equal(a, b)


@pytest.mark.slow
def test_sharded_sc_multi_2d_bitwise():
    """Binary SC mixture on a 2-way y-mesh == single device, bitwise
    (2D block kernel: ghost rho blocks + edge-row patches)."""
    from sc_separation_2d import SeparationSCSim
    from sailfish_tpu.parallel.halo_multi import ShardedPallasSCMulti2D
    dims = dict(lat_nx=128, lat_ny=256, max_iters=15, every=15)
    _, fs_1 = _run_sharded(SeparationSCSim, dims, '')
    r, fs_n = _run_sharded(SeparationSCSim, dims, '2')
    assert isinstance(r._pallas, ShardedPallasSCMulti2D)
    for a, b in zip(fs_1, fs_n):
        assert np.array_equal(a, b)


@pytest.mark.slow
def test_sharded_sc_multi_2d_walls_gravity_bitwise():
    """Rayleigh-Taylor (walls + per-component gravity) sharded 2D."""
    from sc_rayleigh_taylor_2d import RayleighTaylorSCSim
    dims = dict(lat_nx=128, lat_ny=256, max_iters=15, every=15)
    _, fs_1 = _run_sharded(RayleighTaylorSCSim, dims, '')
    _, fs_n = _run_sharded(RayleighTaylorSCSim, dims, '2')
    for a, b in zip(fs_1, fs_n):
        assert np.array_equal(a, b)


@pytest.mark.slow
def test_sharded_fe_2d_bitwise():
    """Binary free energy on a 2-way y-mesh == single device, bitwise
    (phi wrap blocks carry the neighbors' fresh edge rows)."""
    from fe_separation_2d import SeparationFESim
    from sailfish_tpu.parallel.halo_multi import ShardedPallasFE2D
    dims = dict(lat_nx=128, lat_ny=256, max_iters=15, every=15)
    _, fs_1 = _run_sharded(SeparationFESim, dims, '')
    r, fs_n = _run_sharded(SeparationFESim, dims, '2')
    assert isinstance(r._pallas, ShardedPallasFE2D)
    for a, b in zip(fs_1, fs_n):
        assert np.array_equal(a, b)


@pytest.mark.slow
def test_sharded_fe_2d_wetting_force_bitwise():
    """FE Poiseuille: walls + wetting mirror (reach-2 phi stencil
    across shard boundaries) + body force + phi-interpolated tau."""
    from fe_poiseuille_2d import FEPoiseuilleSim
    dims = dict(lat_nx=128, lat_ny=256, max_iters=15, every=15)
    _, fs_1 = _run_sharded(FEPoiseuilleSim, dims, '')
    _, fs_n = _run_sharded(FEPoiseuilleSim, dims, '2')
    for a, b in zip(fs_1, fs_n):
        assert np.array_equal(a, b)


@pytest.mark.slow
def test_sharded_sc_single_2d_bitwise():
    """Single-component Shan-Chen on a 2-way y-mesh == single device
    (2D block kernel, edge_io carry). Tight epsilon: XLA CPU
    FMA-contracts the interpret-mode kernel differently inside
    shard_map (see the 3D SC test)."""
    import jax
    from sailfish_tpu.models.single import LBSingleFluidShanChen
    from sailfish_tpu.parallel.halo import ShardedPallasStep2D
    from sailfish_tpu.subdomain import Subdomain2D

    class Sep2(Subdomain2D):
        def boundary_conditions(self, hx, hy):
            pass

        def initial_conditions(self, sim, hx, hy):
            sim.rho[:] = np.random.RandomState(7).rand(
                *sim.rho.shape) / 100 + 0.693

    class S2(LBSingleFluidShanChen):
        subdomain = Sep2

        @classmethod
        def update_defaults(cls, d):
            d.update(dict(G=-5.0, visc=1.0 / 6.0, periodic_x=True,
                          periodic_y=True, sc_potential='classic'))

    dims = dict(lat_nx=128, lat_ny=256, max_iters=15, every=15)
    _, fs_1 = _run_sharded(S2, dims, '')
    r, fs_n = _run_sharded(S2, dims, '2')
    assert isinstance(r._pallas, ShardedPallasStep2D)
    assert r._pallas.sc
    for a, b in zip(fs_1, fs_n):
        assert np.max(np.abs(a - b)) < 1e-6

    # the carried rho (interior emitted in-kernel, edge rows streamed
    # in XLA) must BITWISE match a pre-pass recomputed from the
    # carried f within the same compilation context
    p = r._pallas
    carry = p.pad_state(r.f)
    carry = jax.lax.fori_loop(0, 3, lambda i, c: p.step(c, i), carry)
    f, rho, rlo, rhi = (np.asarray(x) for x in carry[:4])
    ref_c = p._sharded_init(carry[0])
    ref = np.asarray(ref_c[1])          # interior rows valid
    ref_lo = np.asarray(ref_c[2])       # streamed edge rows
    ref_hi = np.asarray(ref_c[3])
    nsh = p.nshards
    yl = rho.shape[0] // nsh
    for s in range(nsh):
        blk = rho[s * yl:(s + 1) * yl]
        refblk = ref[s * yl:(s + 1) * yl]
        assert np.array_equal(blk[1:-1], refblk[1:-1])
        assert np.array_equal(rlo[s], ref_lo[s])
        assert np.array_equal(rhi[s], ref_hi[s])


@pytest.mark.slow
def test_sharded_sc_single_3d_bitwise():
    """Single-component Shan-Chen sharded (edge_io slab kernel) ==
    single device (wrap-epilogue emission), bitwise."""
    from sailfish_tpu.models.single import LBSingleFluidShanChen
    from sailfish_tpu.parallel.halo import ShardedPallasStep3D
    from sailfish_tpu.subdomain import Subdomain3D

    class Sep3(Subdomain3D):
        def boundary_conditions(self, hx, hy, hz):
            pass

        def initial_conditions(self, sim, hx, hy, hz):
            sim.rho[:] = np.random.RandomState(7).rand(
                *sim.rho.shape) / 100 + 0.693

    class S3(LBSingleFluidShanChen):
        subdomain = Sep3

        @classmethod
        def update_defaults(cls, d):
            d.update(dict(G=-5.0, visc=1.0 / 6.0, periodic_x=True,
                          periodic_y=True, periodic_z=True,
                          sc_potential='classic', grid='D3Q19'))

    dims = dict(lat_nx=32, lat_ny=16, lat_nz=12, max_iters=15,
                every=15)
    _, fs_1 = _run_sharded(S3, dims, '')
    r, fs_n = _run_sharded(S3, dims, '4')
    assert isinstance(r._pallas, ShardedPallasStep3D)
    assert r._pallas.sc

    # ('z','y') 2-axis mesh: the kernel-emitted face/row path (face_io
    # with sc) must agree too, and its carry must be reproducible
    rzy, fs_zy = _run_sharded(S3, dims, '2x2')
    assert rzy._pallas.two_axis and rzy._pallas.face_io
    for a, b in zip(fs_1, fs_zy):
        assert np.max(np.abs(a - b)) < 1e-6
    import jax as _jax
    pzy = rzy._pallas
    czy = pzy.pad_state(rzy.f)
    czy = _jax.lax.fori_loop(0, 3, lambda i, c: pzy.step(c, i), czy)
    refzy = pzy._sharded_init(czy[0])
    for j in range(2, 10):   # rlo/rhi, glo/ghi, gylo/gyhi, rrlo/rrhi
        assert np.array_equal(np.asarray(czy[j]),
                              np.asarray(refzy[j])), j
    for a, b in zip(fs_1, fs_n):
        # the sharded wiring is value- and order-exact, but XLA CPU
        # compiles the (interpret-mode) kernel with context-dependent
        # FMA contraction inside shard_map vs outside, producing
        # 1-ulp collide differences (verified: identical kernel
        # instance + identical inputs differ by 3.7e-9 in the two
        # contexts); hold a tight epsilon instead of bitwise here
        assert np.max(np.abs(a - b)) < 1e-6

    # internal consistency of the emission+edge-fixup carry: the
    # carried rho (interior emitted in-kernel, edges streamed in XLA)
    # must BITWISE match a pre-pass recomputed from the carried f
    import jax
    p = r._pallas
    carry = p.pad_state(r.f)
    carry = jax.lax.fori_loop(0, 3, lambda i, c: p.step(c, i), carry)
    f, rho, rlo, rhi = (np.asarray(x) for x in carry[:4])
    ref = np.asarray(p._sharded_init(carry[0])[1])
    Z_loc = f.shape[1] // p.nshards if False else None
    nsh = p.nshards
    zl = rho.shape[0] // nsh
    for s in range(nsh):
        blk = rho[s * zl:(s + 1) * zl]
        refblk = ref[s * zl:(s + 1) * zl]
        assert np.array_equal(blk[1:-1], refblk[1:-1])   # emitted
        assert np.array_equal(rlo[s], refblk[0])         # XLA edges
        assert np.array_equal(rhi[s], refblk[-1])


@pytest.mark.slow
def test_sharded_sc_multi_3d_two_axis_zy():
    """Binary SC mixture on a ('z','y') 2-axis mesh: K-component port
    of the single-fluid zy machinery (per-component gy/ry/rr carries,
    psi y-fix). Fields match single-device to the documented 1-ulp
    FMA epsilon; the carry is BITWISE reproducible from the carried
    fs."""
    import jax

    from sc_separation_3d import SeparationSCSim
    from sailfish_tpu.parallel.halo_multi import ShardedPallasSCMulti3D
    dims = dict(lat_nx=32, lat_ny=16, lat_nz=12, max_iters=15, every=15)
    _, fs_1 = _run_sharded(SeparationSCSim, dims, '')
    r, fs_n = _run_sharded(SeparationSCSim, dims, '2x2')
    assert isinstance(r._pallas, ShardedPallasSCMulti3D)
    assert r._pallas.two_axis
    for a, b in zip(fs_1, fs_n):
        assert np.max(np.abs(a - b)) < 1e-6

    # carry self-consistency: after a few steps, everything derivable
    # from the carried fs (emitted interior rho, edge planes, rr rows,
    # gy faces) must BITWISE match a from-scratch recompute
    p = r._pallas
    K = p.K
    carry = p.pad_state(r.f)
    carry = jax.lax.fori_loop(0, 3, lambda i, c: p.step(c, i), carry)
    ref = p._sharded_init(*carry[:K])
    zl = np.asarray(carry[K]).shape[0] // p.nshards
    yl = np.asarray(carry[K]).shape[1] // p.ny_shards
    for c in range(K):
        rho = np.asarray(carry[K + c])
        rho_ref = np.asarray(ref[K + c])
        for s in range(p.nshards):
            for t in range(p.ny_shards):
                blk = rho[s * zl:(s + 1) * zl, t * yl:(t + 1) * yl]
                rb = rho_ref[s * zl:(s + 1) * zl,
                             t * yl:(t + 1) * yl]
                assert np.array_equal(blk[1:-1, 1:-1], rb[1:-1, 1:-1])
    for j in range(2 * K, 10 * K):   # edges, faces, gy, rr
        assert np.array_equal(np.asarray(carry[j]),
                              np.asarray(ref[j])), j


@pytest.mark.slow
def test_sharded_fe_3d_two_axis_zy():
    """Non-wetting binary FE on a ('z','y') 2-axis mesh: the phi
    samples' wrapped y-rows read neighbor rows (py), every phi plane's
    stale edge rows read the fresh pr arrays, corners ride the
    two-hop extensions. Fields match single-device to the documented
    1-ulp FMA epsilon; the carry is bitwise reproducible."""
    import jax

    from fe_separation_3d import SeparationFESim3D
    from sailfish_tpu.parallel.halo_multi import ShardedPallasFE3D
    dims = dict(lat_nx=32, lat_ny=16, lat_nz=12, max_iters=15, every=15)
    _, fs_1 = _run_sharded(SeparationFESim3D, dims, '')
    r, fs_n = _run_sharded(SeparationFESim3D, dims, '2x2')
    assert isinstance(r._pallas, ShardedPallasFE3D)
    assert r._pallas.two_axis and not r._pallas.wetting
    for a, b in zip(fs_1, fs_n):
        assert np.max(np.abs(a - b)) < 1e-6

    p = r._pallas
    carry = p.pad_state(r.f)
    carry = jax.lax.fori_loop(0, 3, lambda i, c: p.step(c, i), carry)
    ref = p._sharded_init(*carry[:2])
    phi = np.asarray(carry[2])
    phi_ref = np.asarray(ref[2])
    zl = phi.shape[0] // p.nshards
    yl = phi.shape[1] // p.ny_shards
    for s in range(p.nshards):
        for t in range(p.ny_shards):
            blk = phi[s * zl:(s + 1) * zl, t * yl:(t + 1) * yl]
            rb = phi_ref[s * zl:(s + 1) * zl, t * yl:(t + 1) * yl]
            assert np.array_equal(blk[1:-1, 1:-1], rb[1:-1, 1:-1])
    for j in range(3, 15):   # edges, faces, gy, pr
        assert np.array_equal(np.asarray(carry[j]),
                              np.asarray(ref[j])), j


@pytest.mark.slow
def test_sharded_fe_3d_two_axis_zy_wetting():
    """FE wetting on a ('z','y') 2-axis mesh: the wall mirror widens
    the phi stencil's y-reach to two rows, so the mirror moves out of
    the kernel -- the step computes the wetting-adjusted phi_w inputs
    in XLA from the carried raw-phi materials (halo_multi._phi_w_ext)
    and calls the kernel in its non-wetting y_ghosts mode. The mirror
    is selects + one subtract, so fields still match single-device to
    the documented 1-ulp FMA epsilon and the carry is bitwise
    reproducible."""
    import jax

    from fe_viscous_fingering import FingeringFESim
    from sailfish_tpu.parallel.halo_multi import ShardedPallasFE3D
    dims = dict(lat_nx=32, lat_ny=16, lat_nz=12, max_iters=15, every=15,
                model='bgk')
    _, fs_1 = _run_sharded(FingeringFESim, dims, '')
    r, fs_n = _run_sharded(FingeringFESim, dims, '2x2')
    assert isinstance(r._pallas, ShardedPallasFE3D)
    assert r._pallas.two_axis and r._pallas.wetting_zy
    for a, b in zip(fs_1, fs_n):
        assert np.max(np.abs(a - b)) < 1e-6

    p = r._pallas
    carry = p.pad_state(r.f)
    carry = jax.lax.fori_loop(0, 3, lambda i, c: p.step(c, i), carry)
    ref = p._sharded_init(*carry[:2])
    phi = np.asarray(carry[2])
    phi_ref = np.asarray(ref[2])
    zl = phi.shape[0] // p.nshards
    yl = phi.shape[1] // p.ny_shards
    for s in range(p.nshards):
        for t in range(p.ny_shards):
            blk = phi[s * zl:(s + 1) * zl, t * yl:(t + 1) * yl]
            rb = phi_ref[s * zl:(s + 1) * zl, t * yl:(t + 1) * yl]
            assert np.array_equal(blk[1:-1, 1:-1], rb[1:-1, 1:-1])
    for j in range(3, 15):   # edges, faces, gy, pr
        assert np.array_equal(np.asarray(carry[j]),
                              np.asarray(ref[j])), j


@pytest.mark.slow
def test_sharded_sc_single_2d_x_sharded():
    """Single-component Shan-Chen on x-sharded 2D meshes ('2x2' and
    the x-heavy '1x4'): the psi wrap lanes read raw-rho neighbor
    columns (kernel rxcol input) and the carried rho's edge columns
    are re-streamed in XLA each step (stream_rho_edge_cols_2d).
    Fields match single-device to the documented 1-ulp FMA epsilon;
    the carried rho is bitwise reproducible from the carried f."""
    import jax
    from sailfish_tpu.models.single import LBSingleFluidShanChen
    from sailfish_tpu.parallel.halo import ShardedPallasStep2D
    from sailfish_tpu.subdomain import Subdomain2D

    class Sep2(Subdomain2D):
        def boundary_conditions(self, hx, hy):
            pass

        def initial_conditions(self, sim, hx, hy):
            sim.rho[:] = np.random.RandomState(7).rand(
                *sim.rho.shape) / 100 + 0.693

    class S2(LBSingleFluidShanChen):
        subdomain = Sep2

        @classmethod
        def update_defaults(cls, d):
            d.update(dict(G=-5.0, visc=1.0 / 6.0, periodic_x=True,
                          periodic_y=True, sc_potential='classic'))

    dims = dict(lat_nx=256, lat_ny=128, max_iters=15, every=15)
    _, fs_1 = _run_sharded(S2, dims, '')
    for mesh in ('2x2', '1x4'):
        r, fs_n = _run_sharded(S2, dims, mesh)
        assert isinstance(r._pallas, ShardedPallasStep2D)
        assert r._pallas.sc and r._pallas.x_sharded
        for a, b in zip(fs_1, fs_n):
            assert np.max(np.abs(a - b)) < 1e-6, mesh

        # carried rho must bitwise match a from-scratch recompute
        p = r._pallas
        carry = p.pad_state(r.f)
        carry = jax.lax.fori_loop(0, 3, lambda i, c: p.step(c, i),
                                  carry)
        ref_c = p._sharded_init(carry[0])
        rho = np.asarray(carry[1])
        ref = np.asarray(ref_c[1])
        yl = rho.shape[0] // p.nshards
        for s in range(p.nshards):
            blk = rho[s * yl:(s + 1) * yl]
            rb = ref[s * yl:(s + 1) * yl]
            # interior rows everywhere; edge rows at the (fresh)
            # edge columns
            assert np.array_equal(blk[1:-1], rb[1:-1]), mesh
            assert np.array_equal(blk[:, :1], rb[:, :1]), mesh
            assert np.array_equal(blk[:, -1:], rb[:, -1:]), mesh


@pytest.mark.slow
def test_sharded_sc_multi_2d_x_sharded():
    """Binary SC mixture on x-sharded 2D meshes ('2x2' and the x-heavy
    '1x4'): the K-component port of the single-fluid ghost-column mode
    -- per-component post-roll f wrap columns + raw-rho psi columns,
    emitted rho edge columns re-streamed in XLA. Fields match
    single-device to the documented 1-ulp FMA epsilon."""
    from sc_separation_2d import SeparationSCSim
    from sailfish_tpu.parallel.halo_multi import ShardedPallasSCMulti2D
    dims = dict(lat_nx=256, lat_ny=128, max_iters=15, every=15)
    _, fs_1 = _run_sharded(SeparationSCSim, dims, '')
    for mesh in ('2x2', '1x4'):
        r, fs_n = _run_sharded(SeparationSCSim, dims, mesh)
        assert isinstance(r._pallas, ShardedPallasSCMulti2D)
        assert r._pallas.x_sharded
        for a, b in zip(fs_1, fs_n):
            assert np.max(np.abs(a - b)) < 1e-6, mesh


@pytest.mark.slow
def test_sharded_sc_multi_2d_x_walls_gravity():
    """Rayleigh-Taylor (walls + per-component gravity) on the x-heavy
    ('y','x') mesh: the in-kernel mask shards over both axes."""
    from sc_rayleigh_taylor_2d import RayleighTaylorSCSim
    dims = dict(lat_nx=128, lat_ny=256, max_iters=15, every=15)
    _, fs_1 = _run_sharded(RayleighTaylorSCSim, dims, '')
    _, fs_n = _run_sharded(RayleighTaylorSCSim, dims, '1x4')
    for a, b in zip(fs_1, fs_n):
        assert np.max(np.abs(a - b)) < 1e-6


@pytest.mark.slow
def test_sharded_fe_2d_x_sharded():
    """Non-wetting binary FE on x-sharded 2D meshes ('2x2', '1x4'):
    f ghost columns + raw-phi stencil columns, emitted phi edge
    columns re-streamed in XLA. Epsilon-gated vs single device."""
    from fe_separation_2d import SeparationFESim
    from sailfish_tpu.parallel.halo_multi import ShardedPallasFE2D
    dims = dict(lat_nx=256, lat_ny=128, max_iters=15, every=15)
    _, fs_1 = _run_sharded(SeparationFESim, dims, '')
    for mesh in ('2x2', '1x4'):
        r, fs_n = _run_sharded(SeparationFESim, dims, mesh)
        assert isinstance(r._pallas, ShardedPallasFE2D)
        assert r._pallas.x_sharded
        for a, b in zip(fs_1, fs_n):
            assert np.max(np.abs(a - b)) < 1e-6, mesh


@pytest.mark.slow
def test_sharded_fe_2d_wetting_x_sharded():
    """FE wetting on x-sharded meshes: the wall mirror's x-reach is
    two columns, so the mirror moves OUT of the kernel -- the step
    computes the wetting-adjusted phi_w in XLA from the carried
    raw-phi materials and feeds the kernel's non-wetting x_ghosts
    mode (the 2D twin of ShardedPallasFE3D.wetting_zy). Walls +
    wetting + body force, epsilon-gated vs single device."""
    from fe_poiseuille_2d import FEPoiseuilleSim
    from sailfish_tpu.parallel.halo_multi import ShardedPallasFE2D
    dims = dict(lat_nx=256, lat_ny=128, max_iters=15, every=15)
    _, fs_1 = _run_sharded(FEPoiseuilleSim, dims, '')
    for mesh in ('2x2', '1x4'):
        r, fs_n = _run_sharded(FEPoiseuilleSim, dims, mesh)
        assert isinstance(r._pallas, ShardedPallasFE2D)
        assert r._pallas.wetting_x
        for a, b in zip(fs_1, fs_n):
            assert np.max(np.abs(a - b)) < 1e-6, mesh
