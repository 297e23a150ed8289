"""The native NUTS sampler must actually sample its target (the reference
took this on faith from PyStan; here it is asserted)."""

import numpy as np

from mcevidence_tpu.samplers import nuts_sample


def test_nuts_gaussian_moments():
    import jax.numpy as jnp

    mean = np.array([1.0, -2.0])
    sig = np.array([0.5, 2.0])

    def lnprob(x):
        z = (x - jnp.asarray(mean)) / jnp.asarray(sig)
        return -0.5 * jnp.dot(z, z)

    samples, lnp = nuts_sample(lnprob, np.zeros(2), 3000, warmup=400,
                               seed=42)
    assert samples.shape == (3000, 2)
    # moments within MCMC error (correlated draws: generous 5-sigma-ish)
    np.testing.assert_allclose(samples.mean(axis=0), mean,
                               atol=5 * sig.max() / np.sqrt(500))
    np.testing.assert_allclose(samples.std(axis=0), sig, rtol=0.15)
    # the returned lnp must be the actual log density at each sample
    z = (samples[:50] - mean) / sig
    np.testing.assert_allclose(lnp[:50], -0.5 * np.sum(z * z, axis=1),
                               atol=1e-4)


def test_nuts_correlated_target():
    import jax.numpy as jnp

    cov = np.array([[1.0, 0.9], [0.9, 1.0]])
    prec = jnp.asarray(np.linalg.inv(cov))

    def lnprob(x):
        return -0.5 * x @ prec @ x

    samples, _ = nuts_sample(lnprob, np.array([3.0, -3.0]), 4000,
                             warmup=400, seed=7)
    c = np.cov(samples.T)
    np.testing.assert_allclose(c, cov, atol=0.2)


def test_nuts_anisotropic_target():
    # scales spanning 3 orders of magnitude: the diagonal mass adaptation
    # must recover correct moments where a unit metric would mix painfully
    import jax.numpy as jnp

    sig = np.array([0.01, 1.0, 10.0])
    mean = np.array([0.5, -1.0, 20.0])

    def lnprob(x):
        z = (x - jnp.asarray(mean)) / jnp.asarray(sig)
        return -0.5 * jnp.dot(z, z)

    samples, _ = nuts_sample(lnprob, mean + sig, 3000, warmup=600, seed=11)
    z = np.abs(samples.mean(axis=0) - mean) / sig
    assert np.all(z < 6.0 / np.sqrt(400)), z
    np.testing.assert_allclose(samples.std(axis=0), sig, rtol=0.2)


def test_stretch_sampler_gaussian_moments():
    """The native stretch-move ensemble sampler recovers a Gaussian target's
    mean and covariance."""
    from mcevidence_tpu.samplers import stretch_sample
    rng = np.random.default_rng(0)
    mean = np.array([1.0, -2.0])
    sig = np.array([0.5, 2.0])

    def lnprob(t):
        return float(-0.5 * np.sum(((t - mean) / sig) ** 2))

    p0 = mean + sig * rng.standard_normal((40, 2))
    chain, lnp = stretch_sample(lnprob, p0, 400, seed=1)
    flat = chain[100:].reshape(-1, 2)           # drop burn-in steps
    np.testing.assert_allclose(flat.mean(axis=0), mean, atol=0.15)
    np.testing.assert_allclose(flat.std(axis=0), sig, rtol=0.15)
    assert lnp.shape == (400, 40)


def test_gaussian_emcee_leg_runs_without_emcee(rng):
    """The ensemble validation leg (reference examples.py:518-531) must run
    even without the optional emcee package, via the native fallback."""
    from mcevidence_tpu.examples import gaussian_emcee
    mle = gaussian_emcee(nwalkers=64, nmcmc=40, kmax=2)
    # Short ensemble chains at d=10 carry heavy step-autocorrelation, which
    # biases the kNN density high (measured ~ -3 in lnZ at this length even
    # with 12k samples) — same behavior as the reference's emcee leg, which
    # was validated visually, never asserted.  This test pins the ballpark;
    # the estimator's precision claims are asserted by the iid/Gibbs/NUTS
    # legs and the sampler's own correctness by the moments test above.
    assert np.isfinite(mle).all()
    assert abs(mle[0]) < 6.0
