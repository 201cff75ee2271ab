"""Tests for safe exploration (get_safe_sample / perturb_actions) —
coverage the reference lacked entirely (SURVEY.md section 4)."""

import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose, assert_array_equal

import safe_learning_tpu as sl
from safe_learning_tpu import (GaussianProcess, GridWorld, LambdaFunction,
                               LinearSystem, Lyapunov, RBF, get_safe_sample,
                               perturb_actions)


def test_perturb_actions_layout():
    states = np.array([[0.0], [1.0]])
    actions = np.array([[0.5], [-0.5]])
    perturbations = np.array([[-0.1], [0.0], [0.1]])
    sa = perturb_actions(states, actions, perturbations)
    assert sa.shape == (6, 2)
    assert_allclose(sa[:3, 0], 0.0)
    assert_allclose(sa[:3, 1], [0.4, 0.5, 0.6])
    assert_allclose(sa[3:, 1], [-0.6, -0.5, -0.4])


def test_perturb_actions_clipping_and_dedup():
    states = np.zeros((1, 1))
    actions = np.array([[0.9]])
    perturbations = np.array([[0.0], [0.2], [0.4]])
    limits = np.array([[-1.0, 1.0]])
    sa = perturb_actions(states, actions, perturbations, limits=limits)
    # 1.1 and 1.3 both clip to 1.0 -> deduplicated.
    assert sa.shape == (2, 2)
    assert_allclose(sorted(sa[:, 1]), [0.9, 1.0])


def _make_lyapunov_with_gp(noise=1e-4, beta=2.0):
    """1-D stable system with GP dynamics learned from samples.

    The initial safe set covers a neighborhood of the origin (like the
    reference's LQR-based initial sets): near the origin the decrease
    ~ -0.73 x^2 vanishes faster than the GP's predictive std, so no
    finite dataset certifies those states from the decrease check alone.
    """
    rng = np.random.default_rng(0)
    grid = GridWorld([[-1, 1]], 11)
    # True dynamics f(x, u) = 0.6 x + 0.4 u.
    x = rng.uniform(-1, 1, size=(60, 2))
    y = 0.6 * x[:, :1] + 0.4 * x[:, 1:]
    gp = GaussianProcess(RBF(1.0, [0.7, 0.7], input_dim=2), x, y, noise,
                         beta=beta)
    policy = LambdaFunction(lambda s: -0.2 * s)
    v = LambdaFunction(lambda s: (s ** 2).sum(axis=1, keepdims=True))
    lyap = Lyapunov(grid, v, gp, 1.0, 1.0, 1e-3, policy,
                    initial_set=[4, 5, 6])
    lyap.update_safe_set()
    return lyap


def test_get_safe_sample_returns_safe_pair():
    lyap = _make_lyapunov_with_gp()
    assert lyap.safe_set.sum() > 3  # GP certifies beyond the initial set
    perturbations = np.linspace(-0.2, 0.2, 5)[:, None]
    sa, var = get_safe_sample(lyap, perturbations,
                              rng=np.random.default_rng(1))
    assert sa.shape == (1, 2)
    assert var > 0
    # The chosen pair provably maps inside the level set.
    mean, std = lyap.dynamics(jnp.asarray(sa))
    future = float(lyap.lyapunov_function(mean)[0, 0]
                   + float(std[0, 0]))
    assert future < lyap.c_max


def test_get_safe_sample_backup_policy_warning():
    lyap = _make_lyapunov_with_gp()
    # Make everything unsafe: empty level set.
    lyap.c_max = -np.inf
    perturbations = np.linspace(-0.2, 0.2, 5)[:, None]
    with pytest.warns(RuntimeWarning, match="backup policy"):
        sa, var = get_safe_sample(lyap, perturbations,
                                  rng=np.random.default_rng(1))
    assert sa.shape == (1, 2)


def test_get_safe_sample_with_action_list():
    lyap = _make_lyapunov_with_gp()
    actions = np.array([[-0.1], [0.0], [0.1]])
    sa, var = get_safe_sample(lyap, actions=actions,
                              rng=np.random.default_rng(2))
    assert sa.shape == (1, 2)
    assert sa[0, 1] in actions[:, 0]


def test_get_safe_sample_num_samples_subsampling():
    lyap = _make_lyapunov_with_gp()
    perturbations = np.zeros((1, 1))
    sa, _ = get_safe_sample(lyap, perturbations, num_samples=3,
                            rng=np.random.default_rng(3))
    assert sa.shape == (1, 2)


def test_exploration_loop_shrinks_uncertainty():
    """Full safe-learning loop: sample -> measure -> add data -> re-verify
    (the flagship loop, reference adaptive_safety_verification.ipynb)."""
    lyap = _make_lyapunov_with_gp(noise=1e-4, beta=2.0)
    perturbations = np.linspace(-0.3, 0.3, 7)[:, None]
    rng = np.random.default_rng(4)

    history = []
    for i in range(3):
        sa, var = get_safe_sample(lyap, perturbations, rng=rng)
        history.append(var)
        measurement = 0.6 * sa[:, :1] + 0.4 * sa[:, 1:]
        lyap.dynamics = lyap.dynamics.add_data_point(sa, measurement)
        lyap.update_safe_set()
    assert lyap.safe_set.sum() >= 1
    assert all(np.isfinite(history))
    # Data genuinely accumulated and the explored pair's uncertainty
    # shrank: re-query the first chosen pair against the final GP.
    assert int(lyap.dynamics.count) == 63  # 60 initial + 3 appended
    assert history[-1] < history[0]


def test_get_safe_sample_actions_mode_multidim():
    """actions= mode builds valid (state_dim + action_dim)-wide rows for
    multi-dimensional states and actions (the reference's np.meshgrid
    ravel at lyapunov.py:750-753 silently produced garbage rows here)."""
    rng = np.random.default_rng(0)
    grid = GridWorld([[-1, 1], [-1, 1]], 7)
    x = rng.uniform(-1, 1, size=(300, 4))
    y = x[:, :2] @ np.array([[0.5, 0.1], [0.0, 0.6]]).T \
        + 0.3 * x[:, 2:]
    gp = GaussianProcess(RBF(0.01, [1.0] * 4, input_dim=4), x, y, 1e-5)
    policy = LambdaFunction(lambda s: -0.2 * s)
    v = LambdaFunction(lambda s: (s ** 2).sum(axis=1, keepdims=True))
    mid = grid.nindex // 2
    lyap = Lyapunov(grid, v, gp, 1.0, 1.0, 1e-3, policy,
                    initial_set=[mid - 1, mid, mid + 1])
    lyap.update_safe_set()

    actions = np.array([[-0.1, 0.0], [0.0, 0.1], [0.1, -0.1]])
    sa, var = get_safe_sample(lyap, actions=actions,
                              rng=np.random.default_rng(2))
    assert sa.shape == (1, 4)
    # The state part is a grid state, the action part one of the actions.
    states = np.asarray(grid.index_to_state(
        grid.state_to_index(sa[:, :2])))
    assert_allclose(states, sa[:, :2], atol=1e-6)
    assert any(np.allclose(sa[0, 2:], a) for a in actions)


def test_safe_set_inplace_mutation_visible_to_membership_check():
    """The cached device safe set must track IN-PLACE host mutations
    (the examples' `lyap.safe_set |= mask` idiom), not just
    reassignments."""
    lyap = _make_lyapunov_with_gp()
    pert = np.zeros((1, 1))
    # Populate the device cache with the current safe set.
    get_safe_sample(lyap, pert, rng=np.random.default_rng(0))
    # Shrink the safe set in place to ONLY the initial set.
    keep = np.zeros_like(lyap.safe_set)
    keep[[4, 5, 6]] = True
    lyap.safe_set &= keep
    sa, _ = get_safe_sample(lyap, pert, rng=np.random.default_rng(0))
    # The chosen pair's mean next state must lie in the SHRUNK set.
    mean, _ = lyap.dynamics(jnp.asarray(sa))
    idx = int(np.asarray(lyap.discretization.state_to_index(mean))[0])
    assert lyap.safe_set[idx]


def test_get_safe_sample_empty_safe_set_raises():
    lyap = _make_lyapunov_with_gp()
    lyap.safe_set[:] = False
    lyap.initial_safe_set = None
    with pytest.raises(RuntimeError, match="safe set is empty"):
        get_safe_sample(lyap, np.zeros((1, 1)),
                        rng=np.random.default_rng(0))


def test_safe_set_reassignment_invalidates_device_cache():
    """Both plain assignment and augmented assignment bump the safe-set
    version, so the cached device copy is refreshed without re-hashing
    the mask on every call."""
    lyap = _make_lyapunov_with_gp()
    v0 = lyap._safe_set_version
    lyap.safe_set = lyap.safe_set.copy()
    lyap.safe_set |= np.zeros_like(lyap.safe_set)
    assert lyap._safe_set_version == v0 + 2


def test_pad_pow2_rejects_empty_batch():
    from safe_learning_tpu.explore import _pad_pow2
    with pytest.raises(ValueError, match="empty"):
        _pad_pow2(np.zeros((0, 3)))


def test_batch_sampler_matches_sequential_loop():
    """get_safe_sample_batch (one fused k-step program, on-device
    selection-grade GP appends) must reproduce the sequential
    get_safe_sample + add_data_point loop: same chosen pairs, same
    measurements, and a final GP that predicts identically (the
    authoritative append runs in the same f64 island)."""
    import jax.numpy as jnp

    from safe_learning_tpu import get_safe_sample_batch

    def build():
        lyap = _make_lyapunov_with_gp()
        lyap.update_safe_set()
        return lyap

    true_dyn = LambdaFunction(
        lambda sa: 0.7 * sa[:, :1] + 0.4 * sa[:, 1:]
        + 0.05 * jnp.sin(3.0 * sa[:, :1]))
    pert = np.array([[-0.1], [0.0], [0.1]])
    k = 4

    # Sequential reference loop.
    lyap_seq = build()
    seq_pairs, seq_ys = [], []
    for _ in range(k):
        sa, _ = get_safe_sample(lyap_seq, pert,
                                rng=np.random.default_rng(0))
        y = np.asarray(true_dyn(jnp.asarray(sa)))
        lyap_seq.dynamics = lyap_seq.dynamics.add_data_point(sa, y)
        seq_pairs.append(sa[0])
        seq_ys.append(y[0])

    # Fused batch.
    lyap_b = build()
    sas, ys, bounds, safes = get_safe_sample_batch(
        lyap_b, true_dyn, k, pert, rng=np.random.default_rng(0))
    assert safes.all()
    assert_allclose(sas, np.asarray(seq_pairs), atol=1e-6)
    assert_allclose(ys, np.asarray(seq_ys), atol=1e-6)
    assert int(lyap_b.dynamics.count) == int(lyap_seq.dynamics.count)

    q = np.array([[0.15, -0.2], [-0.3, 0.1]])
    m_seq, s_seq = lyap_seq.dynamics(jnp.asarray(q))
    m_b, s_b = lyap_b.dynamics(jnp.asarray(q))
    assert_allclose(np.asarray(m_b), np.asarray(m_seq), atol=1e-6)
    assert_allclose(np.asarray(s_b), np.asarray(s_seq), atol=1e-6)


def test_batch_sampler_backup_warning():
    """With an empty certified level (c_max very low) every step falls
    back to the backup policy and a RuntimeWarning is raised once."""
    from safe_learning_tpu import get_safe_sample_batch

    lyap = _make_lyapunov_with_gp()
    lyap.update_safe_set()
    lyap.c_max = -np.inf  # nothing maps inside
    true_dyn = LambdaFunction(lambda sa: 0.7 * sa[:, :1] + 0.4 * sa[:, 1:])
    with pytest.warns(RuntimeWarning, match="backup"):
        sas, ys, bounds, safes = get_safe_sample_batch(
            lyap, true_dyn, 3, np.zeros((1, 1)),
            rng=np.random.default_rng(0))
    assert not safes.any()
    assert sas.shape == (3, 2)  # 1-D state + 1-D action


def test_batch_sampler_backup_uses_zero_perturbation():
    """The fused batch fallback must restrict to the UNperturbed
    backup-policy candidates (reference lyapunov.py:780-793), exactly
    like the sequential path — not argmax-variance over the perturbed
    set."""
    from safe_learning_tpu import get_safe_sample_batch

    lyap = _make_lyapunov_with_gp()
    lyap.c_max = -np.inf  # nothing is provably safe
    true_dyn = LambdaFunction(lambda sa: 0.6 * sa[:, :1] + 0.4 * sa[:, 1:])
    pert = np.array([[-0.5], [0.5]])  # deliberately NO zero row
    with pytest.warns(RuntimeWarning, match="backup"):
        sas, _, _, safes = get_safe_sample_batch(
            lyap, true_dyn, 3, pert, rng=np.random.default_rng(0))
    assert not safes.any()
    # Every chosen action is the policy's own action at the state.
    assert_allclose(sas[:, 1], -0.2 * sas[:, 0], atol=1e-6)


def test_safe_set_item_assignment_invalidates_device_cache():
    """Direct item assignment (``lyap.safe_set[i] = False``) must be
    visible to the cached device membership mask — a stale, larger mask
    would certify a sample whose next state was just pruned."""
    lyap = _make_lyapunov_with_gp()
    pert = np.zeros((1, 1))
    # Populate the device cache with the current safe set.
    get_safe_sample(lyap, pert, rng=np.random.default_rng(0))
    keep = np.zeros(len(lyap.safe_set), dtype=bool)
    keep[[4, 5, 6]] = True
    # Prune via ITEM assignment — no property setter involved.
    lyap.safe_set[~keep] = False
    sa, _ = get_safe_sample(lyap, pert, rng=np.random.default_rng(0))
    mean, _ = lyap.dynamics(jnp.asarray(sa))
    idx = int(np.asarray(lyap.discretization.state_to_index(mean))[0])
    assert lyap.safe_set[idx]


def test_safe_set_alias_write_cannot_stale_device_cache():
    """Writes through the caller's original array after ``lyap.safe_set =
    mask`` must not be able to serve a stale device mask: tracked_mask
    copies, so the alias write simply has no effect on the certificate
    (the conservative direction)."""
    lyap = _make_lyapunov_with_gp()
    pert = np.zeros((1, 1))
    mask = np.array(lyap.safe_set)
    lyap.safe_set = mask
    get_safe_sample(lyap, pert, rng=np.random.default_rng(0))  # warm cache
    mask[:] = True  # alias write — bypasses every tracked idiom
    assert not lyap.safe_set.all() or mask.sum() == len(mask)
    # The device cache and the host mask still agree.
    sa, _ = get_safe_sample(lyap, pert, rng=np.random.default_rng(0))
    mean, _ = lyap.dynamics(jnp.asarray(sa))
    idx = int(np.asarray(lyap.discretization.state_to_index(mean))[0])
    assert lyap.safe_set[idx]
