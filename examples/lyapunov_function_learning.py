"""Learning a neural-network Lyapunov function (CoRL-18).

Mirrors ``/root/reference/examples/lyapunov_function_learning.ipynb``: a
positive-definite-by-construction :class:`LyapunovNetwork` is pre-trained
to match a spherical quadratic candidate, then grown by ROA classification:
states in the gap between the current certified level set and a slightly
larger one are forward-simulated; those that fall back into the level set
become positive training labels for a weighted perceptron loss with a
Lagrangian decrease penalty. The learned safe set is compared against the
LQR quadratic baseline and the true ROA.

Run:  python examples/lyapunov_function_learning.py [--full --plot]
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import safe_learning_tpu as sl  # noqa: E402
from examples._common import Timer, example_args, maybe_save_plot  # noqa: E402

# Degree-3 SOS Lyapunov candidate computed offline with SOSTOOLS for the
# LQR-stabilized pendulum (reference notebook cell 17).
_SOS_Q = np.array([
    [4.09, 0.09225, -5.609e-9, 2.132e-9, 6.079e-10, 2.11, 0.006847,
     0.0937, -0.0271],
    [0.09225, 0.2055, 2.132e-9, 6.079e-10, 1.731e-9, 0.006847, 0.0937,
     -0.0271, 0.03769],
    [-5.609e-9, 2.132e-9, 2.11, 0.006847, 0.0937, -6.223e-8, -1.307e-9,
     -3.692e-9, -5.893e-10],
    [2.132e-9, 6.079e-10, 0.006847, 0.0937, -0.0271, -1.307e-9,
     -3.692e-9, -5.893e-10, 4.724e-10],
    [6.079e-10, 1.731e-9, 0.0937, -0.0271, 0.03769, -3.692e-9,
     -5.893e-10, 4.724e-10, 2.836e-10],
    [2.11, 0.006847, -6.223e-8, -1.307e-9, -3.692e-9, 5.913, 0.2135,
     0.1824, 0.009201],
    [0.006847, 0.0937, -1.307e-9, -3.692e-9, -5.893e-10, 0.2135, 0.1824,
     0.009201, 0.01684],
    [0.0937, -0.0271, -3.692e-9, -5.893e-10, 4.724e-10, 0.1824,
     0.009201, 0.01684, 0.02061],
    [-0.0271, 0.03769, -5.893e-10, 4.724e-10, 2.836e-10, 0.009201,
     0.01684, 0.02061, 0.01081]])


def _extra_args(p):
    p.add_argument(
        "--extended", action="store_true",
        help="certify each candidate with the double-word sweep and its "
             "derived conservative margin (ops/extended_verify; the "
             "tau=0 deterministic pipeline needs no L_v model)")
    p.add_argument(
        "--hybrid", action="store_true",
        help="run the rigor sweeps in the hybrid band-filtered mode (extended-identical certificate, near-plain-f32 cost; see docs/performance.md)")


def main():
    args = example_args(__doc__, extra=_extra_args)
    if args.hybrid:
        # "hybrid" is truthy: every `if args.extended` margin guard and
        # `extended=args.extended` sweep call routes through unchanged.
        args.extended = "hybrid"
    if args.full:
        num_states, outer_iters, inner_iters = 251, 20, 10
        roa_horizon, gap_horizon, pretrain_iters = 500, 100, 300
    else:
        num_states, outer_iters, inner_iters = 101, 16, 10
        roa_horizon, gap_horizon, pretrain_iters = 300, 100, 200

    # Full swing-up normalization (notebook cell 7).
    dt, g = 0.01, 9.81
    m, length, friction = 0.15, 0.5, 0.1
    theta_max, omega_max = np.deg2rad(180), np.deg2rad(360)
    u_max = g * m * length * np.sin(np.deg2rad(60))
    norms = ((theta_max, omega_max), (u_max,))
    pendulum = sl.InvertedPendulum(m, length, friction, dt,
                                   normalization=norms)
    a, b = map(np.asarray, pendulum.linearize())

    grid = sl.GridWorld([[-1.0, 1.0]] * 2, num_states)
    tau = 0.0  # zero-threshold mode (notebook cell 9)
    initial_safe_set = np.linalg.norm(grid.all_points, ord=2,
                                      axis=1) <= 0.1
    print("Grid size: {}".format(grid.nindex))

    k, p_lqr = sl.utils.dlqr(a, b, np.eye(2), np.eye(1))
    policy = sl.Saturation(sl.LinearSystem(-k), -1.0, 1.0)
    l_pol = np.linalg.norm(-k, 1)
    l_dyn = np.linalg.norm(a, 1) + np.linalg.norm(b, 1) * l_pol

    # LQR baseline certificate (notebook cell 15).
    lyap_lqr = sl.Lyapunov(grid, sl.QuadraticFunction(p_lqr), pendulum,
                           l_dyn,
                           sl.GradientNorm(sl.QuadraticFunction(p_lqr),
                                           ord=1),
                           tau, policy,
                           initial_set=np.where(initial_safe_set)[0])
    lyap_lqr.update_safe_set()

    # SOS (SOSTOOLS) baseline certificate: fixed degree-3 monomial
    # candidate in denormalized coordinates, certified via the
    # continuous-time decrease dv/dt < 0 along the true vector field
    # (notebook cell 17).
    q_sos = _SOS_Q
    x_denorm = grid.all_points * np.array([theta_max, omega_max])
    m_feats = np.asarray(sl.utils.monomials(x_denorm, 3))
    values_sos = np.sum((m_feats @ q_sos) * m_feats, axis=1)
    d_feats = np.asarray(sl.utils.derivative_monomials(x_denorm, 3))
    dvdx = 2.0 * np.einsum("nf,nfd->nd", m_feats @ q_sos, d_feats)
    u_denorm = np.asarray(policy(grid.all_points)) * u_max
    f_cont = np.asarray(pendulum.ode(jnp.asarray(x_denorm),
                                     jnp.asarray(u_denorm)))
    dvdt = np.sum(dvdx * f_cont, axis=1)
    order = np.argsort(values_sos)
    certificate = dvdt[order][1:] < 0
    ordered_idx = (len(certificate) + 1 if certificate.all()
                   else int(np.argmin(certificate)) + 1)
    cmax_sos = values_sos[order[ordered_idx - 1]]
    sos_safe = values_sos <= cmax_sos
    print("SOS baseline safe fraction: {:.3f}".format(sos_safe.mean()))

    # True ROA by forward simulation (notebook cell 23).
    @jax.jit
    def closed_loop(x):
        return pendulum(x, policy(x))

    with Timer("compute true ROA ({} steps)".format(roa_horizon)):
        roa = sl.compute_roa(grid, closed_loop, horizon=roa_horizon,
                             tol=0.1)
    print("true ROA fraction: {:.3f}".format(roa.mean()))

    # Neural-network candidate (notebook cell 19).
    net = sl.LyapunovNetwork(2, [64, 64, 64], ["tanh", "tanh", "tanh"],
                             eps=1e-8, key=jax.random.PRNGKey(args.seed))

    # Pre-train the NN to match a spherical quadratic on the initial set
    # (notebook cells 25-26).
    p_sphere = 0.1 * np.eye(2)
    sphere = sl.QuadraticFunction(p_sphere)
    level_states = grid.all_points[initial_safe_set]

    def pretrain_step(params, states):
        target = sphere(states)

        def loss(p):
            return jnp.mean(jnp.abs(net.with_parameters(p)(states)
                                    - target))

        return jax.tree_util.tree_map(lambda w, grad: w - 0.1 * grad,
                                      params, jax.grad(loss)(params))

    @jax.jit
    def pretrain_scan(params, key):
        """The whole pre-training as ONE compiled scan (the notebook runs
        one session.run per step, cells 25-26)."""
        states_all = jnp.asarray(level_states)

        def body(carry, _):
            p, k = carry
            k, kb = jax.random.split(k)
            idx = jax.random.randint(kb, (1000,), 0,
                                     states_all.shape[0])
            return (pretrain_step(p, states_all[idx]), k), None

        (params, _), _ = jax.lax.scan(body, (params, key), None,
                                      length=pretrain_iters)
        return params

    with Timer("pre-train NN candidate"):
        net = net.with_parameters(jax.block_until_ready(pretrain_scan(
            net.parameters_dict, jax.random.PRNGKey(args.seed))))

    lyap_nn = sl.Lyapunov(grid, net, pendulum, l_dyn,
                          sl.GradientNorm(net, ord=1), tau, policy,
                          initial_set=np.where(initial_safe_set)[0])

    def certify():
        """Margin-guarded sweep: derived extended margin, or plain f32.

        In extended mode the derived margin is re-derived per candidate
        (the sweep is rebuilt whenever ``lyapunov_function`` changes).
        """
        if args.extended:
            from safe_learning_tpu.ops.extended_verify import (
                extended_certificate_margin)

            extended_certificate_margin(lyap_nn)
        lyap_nn.update_safe_set(extended=args.extended)

    certify()
    print("pre-trained NN safe fraction: {:.3f} ({:.1f}% of ROA)".format(
        lyap_nn.safe_set.mean(),
        100 * lyap_nn.safe_set.sum() / roa.sum()))

    # Snapshot the pre-trained parameters and restore before training —
    # the notebook does this with tf.train.Saver (cells 29, 32).
    import tempfile

    ckpt_dir = tempfile.mkdtemp(prefix="lyap_ckpt_")
    ckpt_path = sl.checkpoints.save_checkpoint(
        os.path.join(ckpt_dir, "pretrained"), net.parameters_dict)
    net = net.with_parameters(
        sl.checkpoints.restore_checkpoint(ckpt_path, net.parameters_dict))
    lyap_nn.lyapunov_function = net
    lyap_nn.update_values()
    certify()

    # ROA classification training (notebook cells 30-35).
    # The classifier targets the FIXED level set {v < 1}: the candidate
    # is scale-free, so the ROA estimate is taught to coincide with level
    # 1.0 (the notebook feeds safe_level = 1.0 throughout, cell 34).
    safe_level = 1.0
    # Rigor-mode hinge slack: the plain hinge relu(future - values) has
    # zero gradient once the decrease is barely negative, so trained
    # points settle with dec in (-eps, 0] — exactly the band the
    # extended margin refuses (unprovably small decreases), which at
    # full scale (finer shells, more points per level) gates the
    # certified level at every iteration. In rigor mode the hinge
    # demands a RELATIVE decrease of 1% per step (dec < -0.01 v),
    # comfortably below any rigor margin and mild vs the true
    # closed-loop contraction; the plain mode keeps the notebook's
    # zero-slack hinge (reference lyapunov_function_learning.ipynb
    # cell 30).
    decrease_slack = 0.01 if args.extended else 0.0

    @jax.jit
    def train_step(params, states, labels, weights):
        def loss(p):
            nn = net.with_parameters(p)
            values = nn(states)
            future = nn(closed_loop(states))
            class_labels = 2.0 * labels - 1.0
            decision = safe_level - values
            classifier = weights * jnp.maximum(-class_labels * decision,
                                               0.0)
            decrease = labels * jnp.maximum(
                (future - values)
                / (jax.lax.stop_gradient(values) + 1e-8)
                + decrease_slack, 0.0)
            return jnp.mean(classifier + 1000.0 * decrease)

        return jax.tree_util.tree_map(lambda w, grad: w - 5e-3 * grad,
                                      params, jax.grad(loss)(params))

    @jax.jit
    def classifier_scan(params, states_all, labels_all, n_valid, key):
        """``inner_iters`` weighted-classifier steps as one compiled
        scan; per-batch class balancing in-graph (the semantics of
        ``utils.balanced_class_weights``). ``states_all`` is padded to a
        power-of-two bucket so varying target-set sizes reuse compiled
        programs; sampling indices stay below ``n_valid``."""
        def body(carry, _):
            p, k = carry
            k, kb = jax.random.split(k)
            idx = jax.random.randint(kb, (1000,), 0, n_valid)
            batch = states_all[idx]
            labels = labels_all[idx]
            y = labels > 0.5
            n_pos = jnp.maximum(jnp.sum(y), 1)
            n_neg = jnp.maximum(y.size - jnp.sum(y), 1)
            weights = jnp.where(y, y.size / n_pos,
                                y.size / n_neg).astype(labels.dtype)
            return (train_step(p, batch, labels, weights), k), None

        (params, _), _ = jax.lax.scan(body, (params, key), None,
                                      length=inner_iters)
        return params

    key = jax.random.PRNGKey(args.seed + 1)
    roa_estimate = np.copy(lyap_nn.safe_set)
    level_multiplier = 1.3
    c_history = [lyap_nn.c_max]
    frac_history = [lyap_nn.safe_set.mean()]

    with Timer("ROA classification ({} outer iters)".format(outer_iters)):
        for k_out in range(outer_iters):
            c = lyap_nn.c_max
            values = lyap_nn.values.ravel()
            if not np.isfinite(c) or c <= 0.0:
                # Nothing beyond the exempt set certifies yet — possible
                # in rigor mode at tau=0: a near-origin point whose true
                # decrease is below the derived error bound fails the
                # extended check (unprovable at that precision), pinning
                # c_max at -inf. Grow the classifier's frontier from the
                # current ROA estimate instead of deadlocking on an
                # empty (c, 1.3c] gap; certification stays honest (only
                # the TRAINING target region uses this level).
                c = float(np.max(values[roa_estimate]))
            idx_small = values <= c
            idx_big = values <= level_multiplier * c
            idx_gap = idx_big & ~idx_small

            # Forward-simulate gap states (lax.scan over the horizon).
            gap_states = jnp.asarray(grid.all_points[idx_gap])
            if gap_states.shape[0]:
                def step(x, _):
                    return closed_loop(x), None

                gap_states, _ = jax.lax.scan(step, gap_states, None,
                                             length=gap_horizon)
                gap_future_values = np.asarray(net(gap_states)).ravel()
                roa_estimate[idx_gap] |= gap_future_values <= c

            target_idx = idx_big | roa_estimate
            target_set = grid.all_points[target_idx]
            target_labels = roa_estimate[target_idx].astype(
                np.float64).reshape(-1, 1)

            n_valid = len(target_set)
            padded = 1 << max(8, (n_valid - 1).bit_length())
            pad = padded - n_valid
            if pad:
                target_set = np.vstack([
                    target_set, np.zeros((pad, target_set.shape[1]))])
                target_labels = np.vstack([target_labels,
                                           np.zeros((pad, 1))])
            key, sub = jax.random.split(key)
            net = net.with_parameters(classifier_scan(
                net.parameters_dict, jnp.asarray(target_set),
                jnp.asarray(target_labels),
                jnp.asarray(n_valid, dtype=jnp.int32), sub))

            lyap_nn.lyapunov_function = net
            lyap_nn._lipschitz_lyapunov = sl.GradientNorm(net, ord=1)
            lyap_nn.update_values()
            certify()
            roa_estimate |= lyap_nn.safe_set
            c_history.append(lyap_nn.c_max)
            frac_history.append(lyap_nn.safe_set.mean())

    nn_vs_roa = lyap_nn.safe_set.sum() / roa.sum()
    lqr_vs_roa = lyap_lqr.safe_set.sum() / roa.sum()
    print("safe-set fraction history:",
          " ".join("{:.3f}".format(f) for f in frac_history))
    sos_vs_roa = sos_safe.sum() / roa.sum()
    print("final: NN {:.1f}%  vs  LQR {:.1f}%  vs  SOS {:.1f}% of ROA"
          .format(100 * nn_vs_roa, 100 * lqr_vs_roa, 100 * sos_vs_roa))
    assert frac_history[-1] > frac_history[0], \
        "NN safe set should grow during training"
    assert nn_vs_roa > lqr_vs_roa, \
        "learned candidate should certify more than the LQR baseline"

    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(5, 5))
        for z, color, label in [
                (roa, "green", "true ROA"),
                (lyap_nn.safe_set, "orange", "NN"),
                (lyap_lqr.safe_set, "blue", "LQR"),
                (sos_safe, "gold", "SOS")]:
            ax.contour(z.reshape(grid.shape).T, origin="lower",
                       extent=[-1, 1, -1, 1], colors=color, linewidths=1)
        ax.set_xlabel(r"$\theta$ (normalized)")
        ax.set_ylabel(r"$\omega$ (normalized)")
        maybe_save_plot(args, "lyapunov_function_learning")


if __name__ == "__main__":
    main()
