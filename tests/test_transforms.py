"""Property tests for the functional transform algebra."""

import jax
import jax.numpy as jnp
import numpy as np

from pdecontrol_tpu.envs import transforms as T


def _batch(seed=0, shape=(6, 1, 64)):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(2.0, 3.0, size=shape))


def test_normalize_roundtrip_and_stats():
    x = _batch(0)
    t = T.Normalize.create(x.shape, aggregate=True, batched=True)
    t = t.update(x)

    # Running stats after one batch equal the batch stats (Bessel-corrected
    # variance, matching torch.var / the reference update).
    np.testing.assert_allclose(float(jnp.squeeze(t.mean)), float(jnp.mean(x)), rtol=1e-6)
    np.testing.assert_allclose(float(jnp.squeeze(t.var)), float(jnp.var(x, ddof=1)), rtol=1e-6)

    y = t.apply(x)
    np.testing.assert_allclose(np.asarray(t.inverse(y)), np.asarray(x), rtol=1e-5, atol=1e-5)


def test_normalize_welford_merge_matches_two_batch_oracle():
    """Two sequential updates reproduce the reference's gym-style parallel
    variance merge (transforms.py:113-127) computed directly."""
    a, b = _batch(1, (4, 1, 8)), _batch(2, (5, 1, 8))
    t = T.Normalize.create(a.shape, aggregate=True, batched=True)
    t = t.update(a).update(b)

    # Oracle: replicate the merge arithmetic in numpy.
    mean, var, count = 0.0, 0.0, 0
    for batch in (np.asarray(a), np.asarray(b)):
        bsize = batch.shape[0]
        bm, bv = batch.mean(), batch.var(ddof=1)
        delta = bm - mean
        tot = count + bsize
        mean = mean + delta * bsize / tot
        m2 = var * count + bv * bsize + delta**2 * count * bsize / tot
        var, count = m2 / tot, tot

    np.testing.assert_allclose(float(jnp.squeeze(t.mean)), mean, rtol=1e-6)
    np.testing.assert_allclose(float(jnp.squeeze(t.var)), var, rtol=1e-6)
    assert int(t.count) == 9


def test_scale_running_minmax_and_inverse():
    x = _batch(3)
    t = T.Scale.create(x.shape, aggregate=True, batched=True)
    t = t.update(x)

    np.testing.assert_allclose(float(jnp.squeeze(t.vmin)), float(jnp.min(x)))
    np.testing.assert_allclose(float(jnp.squeeze(t.vmax)), float(jnp.max(x)))

    y = t.apply(x)
    assert float(jnp.min(y)) >= -1.0 - 1e-6 and float(jnp.max(y)) <= 1.0 + 1e-6
    np.testing.assert_allclose(np.asarray(t.inverse(y)), np.asarray(x), rtol=1e-6, atol=1e-6)

    # Updating with a smaller-range batch must not shrink the running bounds.
    t2 = t.update(0.1 * x)
    np.testing.assert_allclose(float(jnp.squeeze(t2.vmin)), float(jnp.squeeze(t.vmin)))
    np.testing.assert_allclose(float(jnp.squeeze(t2.vmax)), float(jnp.squeeze(t.vmax)))


def test_scale_known_bounds():
    low = -np.ones((1, 1, 4), np.float32)
    high = np.ones((1, 1, 4), np.float32)
    t = T.Scale.create((1, 1, 4), bounds=(low, high), aggregate=True, batched=True, frozen=True)
    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (3, 1, 4)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(t.apply(x)), np.asarray(x), rtol=1e-6)
    assert t.update(100.0 * x) is t  # frozen


def test_inverted_view_semantics():
    x = _batch(4)
    t = T.Scale.create(x.shape, aggregate=True, batched=True).update(x)
    inv = t.inv

    np.testing.assert_allclose(np.asarray(inv.apply(x)), np.asarray(t.inverse(x)))
    np.testing.assert_allclose(np.asarray(inv.inverse(x)), np.asarray(t.apply(x)))
    assert inv.inv is t

    # Inverse-view update maps values through the inverse before updating the
    # base statistics (reference Transform._Inverse.update).
    y = t.apply(x)
    upd = inv.update(y)
    direct = t.update(inv.apply(y))
    np.testing.assert_allclose(np.asarray(upd.base.vmin), np.asarray(direct.vmin))


def test_gaussian_forcing_matches_reference_formula_and_inverse():
    n, L, sigma = 64, 22.0, 0.4
    xi = (0.0, 0.25, 0.5, 0.75)
    t = T.GaussianForcing.create(n, L, xi, sigma, dtype=jnp.float64)

    # Formula parity (transforms.py:258-260) including the sqrt(2*pi*sigma)
    # normalisation quirk.
    x = np.linspace(0.0, L - L / n, n)
    xi_abs = (L * np.asarray(xi)).reshape(-1, 1)
    expected = np.exp(-((x - xi_abs) ** 2) / (2 * sigma**2)) / np.sqrt(2 * np.pi * sigma)
    np.testing.assert_allclose(np.asarray(t.matrix), expected, rtol=1e-12)

    a = jnp.asarray(np.random.default_rng(5).uniform(-1, 1, (7, 1, 4)))
    phi = t.apply(a)
    assert phi.shape == (7, 1, 64)
    np.testing.assert_allclose(np.asarray(t.inverse(phi)), np.asarray(a), rtol=1e-9, atol=1e-9)


def test_sensor_and_chain():
    x = _batch(6)
    s = T.Sensor(stride=2)
    assert s.apply(x).shape == (6, 1, 32)

    chain = T.Chain(
        transforms=(
            T.Scale.create(x.shape, aggregate=True, batched=True),
            T.Normalize.create(x.shape, aggregate=True, batched=True),
        )
    )
    chain = chain.update(x)
    y = chain.apply(x)
    np.testing.assert_allclose(np.asarray(chain.inverse(y)), np.asarray(x), rtol=1e-4, atol=1e-4)

    # Chain.update is update-then-apply: the Normalize stage must have seen
    # *scaled* values (reference Operation.update, transforms.py:322-328).
    scaled = chain.transforms[0].apply(x)
    np.testing.assert_allclose(
        float(jnp.squeeze(chain.transforms[1].mean)), float(jnp.mean(scaled)), rtol=1e-5
    )


def test_transforms_are_jittable_carries():
    """frozen=False running stats flow through a jitted scan as carries."""
    x = _batch(7)

    def step(t, xs):
        t = t.update(xs)
        return t, t.apply(xs)

    t0 = T.Scale.create(x.shape, aggregate=True, batched=True, dtype=x.dtype)
    t_final, ys = jax.lax.scan(step, t0, jnp.stack([x, 2 * x, 3 * x]))
    np.testing.assert_allclose(float(jnp.squeeze(t_final.vmax)), float(jnp.max(3 * x)))
    assert ys.shape == (3,) + x.shape


def test_sample_transform():
    from pdecontrol_tpu.data.types import Sample

    obs = _batch(8)
    sample = Sample(
        obs=obs,
        actions=jnp.ones((6, 1, 4)),
        nxtobs=2.0 * obs,
        rewards=jnp.zeros((6,)),
        terminated=jnp.zeros((6,), bool),
        truncated=jnp.zeros((6,), bool),
        steps=jnp.zeros((6,), jnp.int32),
    )
    ot = T.Scale.create(obs.shape, aggregate=True, batched=True).update(obs)
    st = T.SampleTransform(otransf=ot, atransf=T.Identity())
    out = st(sample)
    np.testing.assert_allclose(np.asarray(out.obs), np.asarray(ot.apply(obs)))
    np.testing.assert_allclose(np.asarray(out.nxtobs), np.asarray(ot.apply(2.0 * obs)))
    np.testing.assert_allclose(np.asarray(out.actions), np.asarray(sample.actions))
    back = st.inv(out)
    np.testing.assert_allclose(np.asarray(back.obs), np.asarray(obs), rtol=1e-6)
