"""Overlay compositor, edge scene detection, multi-chip sharding."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from havc_tpu.ops.overlay import BLEND_MODES, overlay


class TestOverlay:
    def test_normal_full_coverage(self):
        base = np.zeros((1, 16, 16, 3), np.float32)
        over = np.full((1, 16, 16, 3), 0.8, np.float32)
        out = np.asarray(overlay(jnp.asarray(base), jnp.asarray(over)))
        assert np.abs(out - 0.8).max() < 1e-6

    def test_offset_placement(self):
        base = np.zeros((1, 16, 16, 3), np.float32)
        over = np.ones((1, 4, 4, 3), np.float32)
        out = np.asarray(overlay(jnp.asarray(base), jnp.asarray(over), x=6, y=8))
        assert out[0, 8:12, 6:10].min() == 1.0
        assert out[0, :8].max() == 0.0

    def test_opacity(self):
        base = np.zeros((1, 8, 8, 3), np.float32)
        over = np.ones((1, 8, 8, 3), np.float32)
        out = np.asarray(
            overlay(jnp.asarray(base), jnp.asarray(over), opacity=0.25)
        )
        assert np.abs(out - 0.25).max() < 1e-6

    @pytest.mark.parametrize("mode", BLEND_MODES)
    def test_all_modes_finite(self, mode):
        rng = np.random.default_rng(0)
        base = rng.random((1, 8, 8, 3), dtype=np.float32)
        over = rng.random((1, 8, 8, 3), dtype=np.float32)
        out = np.asarray(
            overlay(jnp.asarray(base), jnp.asarray(over), mode=mode)
        )
        assert np.isfinite(out).all()
        assert out.min() >= 0 and out.max() <= 1

    def test_multiply_math(self):
        base = np.full((1, 4, 4, 3), 0.5, np.float32)
        over = np.full((1, 4, 4, 3), 0.5, np.float32)
        out = np.asarray(
            overlay(jnp.asarray(base), jnp.asarray(over), mode="multiply")
        )
        assert np.abs(out - 0.25).max() < 1e-6

    def test_invalid_mode(self):
        base = jnp.zeros((1, 4, 4, 3))
        with pytest.raises(ValueError):
            overlay(base, base, mode="sepia")


class TestEdgeDetect:
    def test_detects_content_cut(self):
        from havc_tpu.scene.edges import scene_detect_edges

        rng = np.random.default_rng(1)
        # segment A: vertical stripes; segment B: horizontal stripes
        a = np.zeros((6, 48, 64, 3), np.float32)
        a[:, :, ::4] = 0.8
        b = np.zeros((6, 48, 64, 3), np.float32)
        b[:, ::4, :] = 0.8
        clip = np.concatenate([a, b]) + rng.normal(0, 0.01, (12, 48, 64, 3)).astype(np.float32)
        clip = np.clip(clip, 0, 1)
        flags = scene_detect_edges(clip, threshold=0.07, sc_min_int=3)
        assert flags.sc_prev[0] == 1
        # the cut lands at frame 6; the offset-2 lookahead may flag it a
        # frame early (diff compares n vs n+2, reference semantics)
        assert flags.sc_prev[5:8].sum() >= 1
        assert flags.sc_prev[1:4].sum() == 0

    def test_kirsch_on_edge_image(self):
        from havc_tpu.scene.edges import kirsch_edges

        img = np.zeros((1, 32, 32), np.float32)
        img[:, :, 16:] = 1.0  # vertical edge
        mask = np.asarray(kirsch_edges(jnp.asarray(img)))
        assert mask[0, 16, 15:17].max() == 1.0  # edge detected
        assert mask[0, 16, :10].max() == 0.0  # flat region clean


class TestParallel:
    def test_mesh_and_sharded_step(self):
        from havc_tpu.parallel import make_mesh, shard_frames, sharded_pipeline_step

        n = min(8, len(jax.devices("cpu")))
        if n < 2:
            pytest.skip("need multiple devices")
        mesh = make_mesh(n, data=n, model=1)
        step = sharded_pipeline_step(mesh, method=2)
        rng = np.random.default_rng(2)
        frames = rng.random((n, 32, 32, 3), dtype=np.float32)
        with mesh:
            x = shard_frames(jnp.asarray(frames), mesh)
            out, gl = step(x)
        out = np.asarray(out)
        assert out.shape == frames.shape
        assert np.isfinite(out).all()
        # sharded result equals single-device result
        mesh1 = make_mesh(1, data=1, model=1)
        step1 = sharded_pipeline_step(mesh1, method=2)
        with mesh1:
            out1, gl1 = step1(jnp.asarray(frames))
        assert np.abs(out - np.asarray(out1)).max() < 1e-5
        assert abs(float(gl) - float(gl1)) < 1e-5

    def test_sharded_engine_step_matches_single_device(self):
        """The REAL-engine sharded step (DDColor dp + spatial post chain)
        is numerically identical to the single-device run."""
        from havc_tpu.parallel import make_mesh, sharded_engine_step

        n = min(8, len(jax.devices("cpu")))
        if n < 2:
            pytest.skip("need multiple devices")
        mesh = make_mesh(n, data=n // 2 if n % 2 == 0 and n > 2 else n,
                         model=2 if n % 2 == 0 and n > 2 else 1)
        step, params = sharded_engine_step(mesh, config="tiny", input_size=64)
        rng = np.random.default_rng(3)
        frames = rng.random((n, 64, 64, 3), dtype=np.float32)
        with mesh:
            out, gl = step(params, jnp.asarray(frames))
        out = np.asarray(out)
        assert out.shape == frames.shape and np.isfinite(out).all()

        mesh1 = make_mesh(1, data=1, model=1)
        step1, params1 = sharded_engine_step(mesh1, config="tiny", input_size=64)
        with mesh1:
            out1, gl1 = step1(params1, jnp.asarray(frames))
        assert np.abs(out - np.asarray(out1)).max() < 1e-4
        assert abs(float(gl) - float(gl1)) < 1e-5

    def test_dryrun_multichip_runs(self):
        """The driver's multi-chip dryrun completes on virtual CPU devices."""
        import sys, os

        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        import __graft_entry__ as g

        n = min(8, len(jax.devices("cpu")))
        if n < 2:
            pytest.skip("need multiple devices")
        g.dryrun_multichip(n)

    def test_graft_entry_compiles(self):
        import sys, os

        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        import __graft_entry__ as g

        fn, args = g.entry()
        out = jax.jit(fn)(*args)
        assert np.isfinite(np.asarray(out)).all()


class TestHaloExchange:
    def test_sharded_stencil_matches_single_device(self):
        """spatial_halo_call: an edge-padded blur sharded over rows with
        ICI halo exchange == the same op on one device."""
        import jax
        import jax.numpy as jnp
        from havc_tpu.parallel import make_mesh
        from havc_tpu.parallel.halo import spatial_halo_call

        cpus = jax.devices("cpu")
        if len(cpus) < 4:
            import pytest

            pytest.skip("needs 4 virtual CPU devices")
        mesh = make_mesh(4, data=2, model=2, platform="cpu")

        def blur3(x):
            # 3-row vertical box blur with edge padding (halo = 1)
            xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)), mode="edge")
            return (xp[:, :-2] + xp[:, 1:-1] + xp[:, 2:]) / 3.0

        rng = np.random.default_rng(0)
        x = rng.random((4, 16, 12, 3)).astype(np.float32)
        with mesh:
            fn = spatial_halo_call(mesh, blur3, halo=1)
            got = np.asarray(fn(jnp.asarray(x)))
        ref = np.asarray(blur3(jnp.asarray(x)))
        np.testing.assert_allclose(got, ref, atol=1e-6)

    def test_halo_conv_matches(self):
        """A 5x5 conv (halo 2) through the sharded path."""
        import jax
        import jax.numpy as jnp
        from havc_tpu.parallel import make_mesh
        from havc_tpu.parallel.halo import spatial_halo_call

        cpus = jax.devices("cpu")
        if len(cpus) < 4:
            import pytest

            pytest.skip("needs 4 virtual CPU devices")
        mesh = make_mesh(4, data=1, model=4, platform="cpu")
        k = jnp.asarray(
            np.random.default_rng(1).standard_normal((5, 5, 3, 3)).astype(np.float32)
            * 0.1
        )

        def conv(x):
            xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="edge")
            return jax.lax.conv_general_dilated(
                xp, k, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        rng = np.random.default_rng(2)
        x = rng.random((2, 32, 16, 3)).astype(np.float32)
        with mesh:
            fn = spatial_halo_call(mesh, conv, halo=2)
            got = np.asarray(fn(jnp.asarray(x)))
        ref = np.asarray(conv(jnp.asarray(x)))
        np.testing.assert_allclose(got, ref, atol=1e-5)


class TestShardedClassicPipeline:
    def test_matches_single_device(self):
        """The full classic pipeline (DeOldify || DDColor -> merge -> post
        -> restore) sharded over 8 devices equals its single-device run."""
        import jax
        import jax.numpy as jnp
        from havc_tpu.parallel import make_mesh, sharded_classic_pipeline

        n = min(8, len(jax.devices()))
        if n < 2:
            import pytest as _p
            _p.skip("needs multiple devices")
        mesh = make_mesh(n, data=n, model=1)
        step, (do_p, dd_p) = sharded_classic_pipeline(mesh)

        rng = np.random.default_rng(0)
        frames = rng.random((n * 2, 64, 96, 3), dtype=np.float32)
        with mesh:
            out, gl = step(do_p, dd_p, jnp.asarray(frames))
            out.block_until_ready()
        assert out.shape == frames.shape
        assert np.isfinite(float(gl))

        # single-device oracle: same step body, plain jit on one device
        mesh1 = make_mesh(1, data=1, model=1)
        step1, _ = sharded_classic_pipeline(mesh1)
        with mesh1:
            out1, gl1 = step1(do_p, dd_p, jnp.asarray(frames))
        np.testing.assert_allclose(np.asarray(out), np.asarray(out1),
                                   atol=2e-5, rtol=1e-4)
        assert abs(float(gl) - float(gl1)) < 1e-5
