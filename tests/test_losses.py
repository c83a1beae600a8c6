import jax
import jax.numpy as jnp
import numpy as np

from ttsx.train import losses as L

K = jax.random.PRNGKey(0)


def test_arcface_decreases_for_aligned():
    d, c = 16, 4
    w = jax.nn.one_hot(jnp.arange(c), d)
    labels = jnp.arange(c)
    aligned = jax.nn.one_hot(labels, d) * 5.0
    shuffled = jax.nn.one_hot((labels + 1) % c, d) * 5.0
    good = L.arcface_loss(aligned, labels, w)
    bad = L.arcface_loss(shuffled, labels, w)
    assert float(good) < float(bad)


def test_ge2e_prefers_tight_clusters():
    n_spk, m_utt, d = 3, 4, 8
    rng = np.random.default_rng(0)
    centers = rng.normal(size=(n_spk, d)) * 3
    tight = jnp.asarray(np.repeat(centers, m_utt, 0)
                        + rng.normal(size=(n_spk * m_utt, d)) * 0.05,
                        jnp.float32)
    loose = jnp.asarray(rng.normal(size=(n_spk * m_utt, d)), jnp.float32)
    labels = jnp.repeat(jnp.arange(n_spk), m_utt)
    w = jnp.asarray(10.0)
    b = jnp.asarray(-5.0)
    good = L.ge2e_loss(tight, labels, w, b, n_spk, m_utt)
    bad = L.ge2e_loss(loose, labels, w, b, n_spk, m_utt)
    assert float(good) < float(bad)


def test_prosody_loss_masked():
    pred = {k: jnp.ones((2, 8)) for k in ("f0", "energy", "pitch_var")}
    pred.update({"speech_rate": jnp.ones((2, 1)),
                 "pause_dur": jnp.ones((2, 1)),
                 "mfcc": jnp.ones((2, 13))})
    target = jax.tree_util.tree_map(jnp.zeros_like, pred)
    full = L.prosody_loss(pred, target)
    assert float(full) > 0
    # mask hides half the frames; frame losses stay the same value here
    mask = jnp.ones((2, 8)).at[:, 4:].set(0)
    masked = L.prosody_loss(pred, target, mask=mask)
    assert np.isfinite(float(masked))
    # a perfect prediction has zero loss
    zero = L.prosody_loss(target, target)
    assert float(zero) == 0.0


def test_hinge_losses():
    real = [jnp.full((2, 4, 1), 5.0)]
    fake = [jnp.full((2, 4, 1), -5.0)]
    assert float(L.hinge_d_loss(real, fake)) == 0.0  # perfectly separated
    assert float(L.hinge_d_loss(fake, real)) > 0.0
    assert float(L.hinge_g_loss(fake)) > 0  # G wants fake logits high


def test_feature_matching():
    f = [[jnp.ones((2, 4))]]
    r = [[jnp.ones((2, 4))]]
    assert float(L.feature_matching_loss(f, r)) == 0.0
    r2 = [[jnp.zeros((2, 4))]]
    assert float(L.feature_matching_loss(f, r2)) == 1.0


def test_log_rms_energy_loss():
    w = jax.random.normal(K, (2, 256, 1))
    assert float(L.log_rms_energy_loss(w, w)) < 1e-5
    # half-amplitude fake -> |log 0.5| (eps-dominated corrections tiny)
    half = L.log_rms_energy_loss(0.5 * w, w)
    np.testing.assert_allclose(float(half), np.log(2.0), atol=1e-2)
    # symmetric in over/under-estimation
    double = L.log_rms_energy_loss(2.0 * w, w)
    np.testing.assert_allclose(float(half), float(double), atol=1e-2)


def test_adversarial_warmup():
    assert float(L.adversarial_warmup(jnp.asarray(0.0), 16)) == 0.0
    assert float(L.adversarial_warmup(jnp.asarray(160.0), 16)) == 1.0
    assert float(L.adversarial_warmup(jnp.asarray(1e6), 16)) == 1.0


def test_refiner_loss():
    a = jnp.zeros((2, 8, 80))
    b = jnp.ones((2, 8, 80))
    loss, parts = L.refiner_loss(a, b, jnp.asarray(0.5))
    assert abs(float(loss) - 1.5) < 1e-6
    assert float(parts["l1"]) == 1.0
