"""Multi-process (multi-host) dryrun on CPU: N processes x 1 device.

Validates the DCN-ready path of ``parallel/distributed.py`` over the
FULL active-learning loop — every phase the single-process 8-device
dryrun (``__graft_entry__.py``) covers:

1. **Fused verification sweep**: the grid mesh spans all processes'
   devices, the fused sweep runs as ONE globally sharded jit program
   (XLA inserts cross-process collectives).
2. **Adaptive refinement**: the batched sweep + chunked ``N(x) <= R``
   refinement with the grid axis sharded over the global mesh
   (callback-filled batches, allgathered verdicts).
3. **Safe exploration + GP append**: one ``get_safe_sample_batch``
   round with the RNG gated on process 0 and the chosen measurements
   broadcast to every process (``broadcast_from_coordinator``), then a
   re-verification — host-side GP/safe-set state stays in lockstep.
4. **Extended + hybrid rigor sweeps**: ``update_safe_set(extended=True)``
   and ``extended="hybrid"`` with the double-word pipeline's batches
   sharded over the global mesh, asserted equal to each other and to
   the single-process certificates.
5. **Training step** over a 2-D global ``(data, model)`` mesh: grid
   states sharded over ``data``, the PWL value table over ``model``,
   LyapunovNetwork/policy parameters replicated, gradients psum-reduced
   across processes by XLA.

Every phase's result must agree BIT-for-bit with a single-process run
of the same sequence.

Launcher mode (default): spawns ``--nprocs`` worker subprocesses of this
same file and checks their agreement. Worker mode (``--worker``): joins
the coordination service and prints its JSON result.

Usage: ``python scripts/multiprocess_dryrun.py [--nprocs 4]``
"""

import argparse
import hashlib
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def build_instance():
    """Small deterministic verification instance (identical everywhere)."""
    import numpy as np

    import safe_learning_tpu as sl

    grid = sl.GridWorld([[-1.0, 1.0], [-1.0, 1.0]], 32)  # 1024 = 4*256
    a = np.array([[0.6, 0.1], [0.0, 0.5]])
    dyn = sl.LinearSystem([a, np.zeros((2, 1))])
    policy = sl.LinearSystem(np.zeros((1, 2)))
    v = sl.QuadraticFunction(np.eye(2))
    lf = float(np.linalg.norm(a, 2))
    vals = np.sum(grid.all_points ** 2, axis=1)
    initial = np.where(vals <= np.quantile(vals, 0.05))[0]
    # tau chosen so the failing threshold band reaches past the exempt
    # region: the certificate must genuinely discriminate (a
    # nontrivial level cut exercises the cross-process reduction).
    return sl.Lyapunov(grid, v, dyn, lf, 2.0, 0.05, policy,
                       initial_set=initial)


def build_gp_instance(adaptive=False):
    """Uncertain-dynamics instance (stacked GP) for phases 2-3.

    Same shape as the single-process dryrun's flagship instance
    (``__graft_entry__._dryrun_multichip_impl``): contracting mean
    dynamics + GP uncertainty growing away from the explored region, so
    a nontrivial level certifies and exploration takes its primary
    branch.
    """
    import jax.numpy as jnp
    import numpy as np

    import safe_learning_tpu as sl

    rng = np.random.default_rng(7)
    grid = sl.GridWorld([[-1.0, 1.0], [-1.0, 1.0]], 32)
    av = np.array([[0.25, 0.05], [0.0, 0.3]])
    policy = sl.LinearSystem(np.zeros((1, 2)))
    v = sl.QuadraticFunction(np.eye(2))
    lv = sl.LambdaFunction(lambda x: 2.0 * jnp.abs(x))
    lf = float(np.linalg.norm(av, 2))
    x_inner = np.column_stack([
        rng.uniform(-0.4, 0.4, 24), rng.uniform(-0.4, 0.4, 24),
        np.zeros(24)])
    gp = sl.StackedGaussianProcess(
        [sl.RBF(1.0, [0.3] * 3, input_dim=3),
         sl.RBF(1.0, [0.35] * 3, input_dim=3)], x_inner,
        x_inner[:, :2] @ av.T, noise_variances=1e-4,
        mean_functions=[sl.LinearSystem([av[[d]], np.zeros((1, 1))])
                        for d in range(2)], capacity=64)
    tau = float(np.min(grid.unit_maxes))
    vals = np.sum(grid.all_points ** 2, axis=1)
    initial = np.where(vals <= 0.02)[0]
    lyap = sl.Lyapunov(grid, v, gp, lf, lv, tau, policy,
                       initial_set=initial, adaptive=adaptive)
    true_dyn = sl.LinearSystem([av, np.zeros((2, 1))])
    return lyap, true_dyn


def _hash(arr):
    import numpy as np

    return hashlib.sha1(np.ascontiguousarray(arr).tobytes()).hexdigest()


def run_phases(mesh=None, mesh2d=None):
    """Run all four phases; return the result dict.

    ``mesh=None`` is the single-process reference; otherwise the global
    1-D grid mesh (and ``mesh2d`` the 2-D ``(data, model)`` mesh).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    import safe_learning_tpu as sl
    from safe_learning_tpu.parallel.distributed import (
        broadcast_from_coordinator, fetch_global, global_array,
        is_coordinator, put_global, sharded_certified_level)

    out = {}

    # Phase 1: fused sweep (linear instance).
    lyap = build_instance()
    if mesh is None:
        lyap.update_safe_set()
        safe, c_max = np.asarray(lyap.safe_set), float(lyap.c_max)
    else:
        safe, c_max = sharded_certified_level(lyap, mesh)
    out["fused"] = {"safe_sum": int(safe.sum()), "safe_hash": _hash(safe),
                    "c_max": float(c_max),
                    "ref_hash": _hash(np.asarray(lyap._refinement))}

    # Phase 2: adaptive refinement (batched path, GP instance).
    lyap_ad, _ = build_gp_instance(adaptive=True)
    lyap_ad.mesh = mesh
    lyap_ad.update_safe_set(max_refinement=2)
    out["adaptive"] = {"safe_sum": int(np.asarray(lyap_ad.safe_set).sum()),
                       "safe_hash": _hash(np.asarray(lyap_ad.safe_set)),
                       "c_max": float(lyap_ad.c_max),
                       "ref_hash": _hash(np.asarray(lyap_ad._refinement))}
    # A fused can_shrink=False pass over the adaptively refined state:
    # kept-but-not-recertified states must preserve their refinement
    # level (> 1) identically on the single- and multi-process paths.
    lyap_ad.update_safe_set(can_shrink=False)
    out["adaptive"]["ref_hash_kept"] = _hash(
        np.asarray(lyap_ad._refinement))
    out["adaptive"]["safe_hash_kept"] = _hash(
        np.asarray(lyap_ad.safe_set))

    # Phase 3: exploration round gated on the coordinator + GP append +
    # re-verification.
    lyap_gp, true_dyn = build_gp_instance()
    lyap_gp.mesh = mesh
    lyap_gp.update_safe_set()
    k = 3
    perturbations = np.linspace(-0.1, 0.1, 5)[:, None]
    if mesh is None or is_coordinator():
        xu, y, _, flags = sl.get_safe_sample_batch(
            lyap_gp, true_dyn, k, perturbations, num_samples=32,
            rng=np.random.default_rng(0), apply=False)
        assert flags.all(), "exploration must take its primary branch"
        xu, y = np.asarray(xu), np.asarray(y)
    else:
        xu = np.zeros((k, 3), dtype=np.float64)
        y = np.zeros((k, 2), dtype=np.float64)
    if mesh is not None:
        xu, y = map(np.asarray, broadcast_from_coordinator((xu, y)))
    lyap_gp.dynamics = lyap_gp.dynamics.add_data_point(xu, y)
    lyap_gp.update_safe_set(can_shrink=False)
    gp = lyap_gp.dynamics
    out["explore"] = {
        "count": int(gp.count),
        "xu_hash": _hash(xu), "y_hash": _hash(y),
        "xbuf_hash": _hash(np.asarray(gp.X_buf)),
        "safe_hash": _hash(np.asarray(lyap_gp.safe_set)),
        "ref_hash": _hash(np.asarray(lyap_gp._refinement)),
        "c_max": float(lyap_gp.c_max)}

    # Phase 4: extended (double-word) + hybrid sweeps over the global
    # mesh. The rigor pipeline is pure SPMD arithmetic, so its batches
    # shard through the same put_global/fetch_global path as the plain
    # sweep; the hybrid mode's band filter runs on allgathered
    # diagnostics, identical on every process.
    from safe_learning_tpu.ops.extended_verify import (
        extended_certificate_margin)

    lyap_ext, _ = build_gp_instance()
    lyap_ext.mesh = mesh
    lyap_ext.extended_lv_matrix = 2.0 * np.eye(2)
    extended_certificate_margin(lyap_ext,
                                lv_matrix=lyap_ext.extended_lv_matrix)
    lyap_ext.update_safe_set(extended=True)
    out["extended"] = {
        "safe_sum": int(np.asarray(lyap_ext.safe_set).sum()),
        "safe_hash": _hash(np.asarray(lyap_ext.safe_set)),
        "c_max": float(lyap_ext.c_max)}
    lyap_ext.safe_set = np.zeros(lyap_ext.discretization.nindex,
                                 dtype=bool)
    lyap_ext.safe_set |= lyap_ext.initial_safe_set
    lyap_ext.update_safe_set(extended="hybrid")
    out["extended"]["hybrid_safe_hash"] = _hash(
        np.asarray(lyap_ext.safe_set))
    out["extended"]["hybrid_c_max"] = float(lyap_ext.c_max)
    out["extended"]["band_fraction"] = float(lyap_ext.last_band_fraction)
    assert out["extended"]["hybrid_safe_hash"] == \
        out["extended"]["safe_hash"], "hybrid must equal extended"
    assert out["extended"]["hybrid_c_max"] == out["extended"]["c_max"]

    # Phase 5: (data, model) training step.
    grid = sl.GridWorld([[-0.5, 0.5], [-1.0, 1.0]], [8, 16])
    pend = sl.InvertedPendulum(mass=0.25, length=0.5, friction=0.1,
                               dt=0.01)
    a, b = pend.linearize()
    from safe_learning_tpu.utils import dlqr

    kmat, _ = dlqr(a, b, np.eye(2), np.eye(1))
    policy = sl.LinearSystem(-kmat)
    rng = np.random.default_rng(0)
    x_train = np.column_stack([
        rng.uniform(-0.5, 0.5, 16), rng.uniform(-1.0, 1.0, 16),
        rng.uniform(-0.8, 0.8, 16)])
    y_train = np.asarray(pend(jnp.asarray(x_train[:, :2]),
                              jnp.asarray(x_train[:, 2:])))
    gp_dyn = sl.GaussianProcess(
        sl.RBF(0.01, [0.3, 0.3, 0.5], input_dim=3), x_train, y_train,
        noise_variance=1e-6, mean_function=sl.LinearSystem([a, b]))
    lyap_net = sl.LyapunovNetwork(2, [4, 4], ["tanh", "tanh"],
                                  key=jax.random.PRNGKey(0))
    value_fn = sl.Triangulation(grid, np.zeros(grid.nindex), project=True)
    reward = sl.LambdaFunction(
        lambda xu_: -(xu_[:, :1] ** 2 + 0.1 * xu_[:, 2:] ** 2))
    batch = 16
    states_np = np.asarray(grid.all_points[:batch])
    gamma, lr = 0.98, 1e-3

    def loss_fn(net_params, table, states):
        net = lyap_net.with_parameters(net_params)
        vf = value_fn.replace(parameters=table)
        actions = policy(states)
        mean, err = gp_dyn(states, actions)
        decrease = (net(mean).reshape(-1) - net(states).reshape(-1)
                    + jnp.sum(err, axis=1))
        lyap_loss = jnp.mean(jax.nn.relu(decrease + 1e-3))
        r = reward(jnp.concatenate([states, actions], axis=1)).reshape(-1)
        target = r + gamma * vf(mean).reshape(-1)
        bellman = jnp.mean((vf(states).reshape(-1)
                            - jax.lax.stop_gradient(target)) ** 2)
        return lyap_loss + bellman

    @jax.jit
    def train_step(net_params, table, states):
        loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            net_params, table, states)
        g_net, g_table = grads
        new_net = jax.tree_util.tree_map(lambda w, g: w - lr * g,
                                         net_params, g_net)
        return loss, new_net, table - lr * g_table

    net_params = lyap_net.parameters_dict
    table_np = np.asarray(value_fn.parameters)
    if mesh2d is None:
        loss, new_net, new_table = train_step(
            net_params, jnp.asarray(table_np), jnp.asarray(states_np))
        new_table = np.asarray(new_table)
    else:
        state_sh = NamedSharding(mesh2d, P("data", None))
        table_sh = NamedSharding(mesh2d, P("model", None))
        repl = NamedSharding(mesh2d, P())
        states_g = global_array(states_np.shape, states_np.dtype, mesh2d,
                                lambda idx: states_np[idx], spec=state_sh.spec)
        table_g = global_array(table_np.shape, table_np.dtype, mesh2d,
                               lambda idx: table_np[idx], spec=table_sh.spec)
        net_params = jax.tree_util.tree_map(
            lambda p: put_global(np.asarray(p), repl), net_params)
        with mesh2d:
            loss, new_net, new_table = train_step(net_params, table_g,
                                                  states_g)
        new_table = fetch_global(new_table)
    flat = np.concatenate(
        [np.asarray(fetch_global(leaf)).ravel()
         for leaf in jax.tree_util.tree_leaves(new_net)])
    out["train"] = {"loss": float(loss), "table_hash": _hash(new_table),
                    "net_hash": _hash(flat)}
    return out


def worker(coordinator, nprocs, pid):
    """Join the service, run all phases, print a JSON line."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=1")
    import jax
    import jax._src.xla_bridge as xb

    xb._backend_factories.pop("axon", None)
    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from safe_learning_tpu.parallel.distributed import (
        initialize_distributed, is_coordinator, make_global_mesh)

    idx, count = initialize_distributed(coordinator, nprocs, pid)
    assert count == nprocs, (idx, count)
    assert len(jax.devices()) == nprocs  # global device list

    from jax.sharding import Mesh

    mesh = make_global_mesh()
    devices = np.asarray(jax.devices())
    data = nprocs // 2 if nprocs % 2 == 0 else nprocs
    mesh2d = Mesh(devices.reshape(data, nprocs // data), ("data", "model"))

    out = run_phases(mesh=mesh, mesh2d=mesh2d)
    out["pid"] = idx
    out["coordinator"] = is_coordinator()
    out["n_devices"] = len(jax.devices())
    print(json.dumps(out), flush=True)


def single_process_reference():
    """The same phases in ONE process (ground truth)."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    import jax._src.xla_bridge as xb

    xb._backend_factories.pop("axon", None)
    jax.config.update("jax_platforms", "cpu")
    return run_phases()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--nprocs", type=int, default=4)
    parser.add_argument("--worker", action="store_true")
    parser.add_argument("--coordinator", default="localhost:45677")
    parser.add_argument("--pid", type=int, default=0)
    args = parser.parse_args()

    if args.worker:
        worker(args.coordinator, args.nprocs, args.pid)
        return

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # CPU run: skip the TPU tunnel
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker",
         "--nprocs", str(args.nprocs), "--pid", str(i),
         "--coordinator", args.coordinator],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=env) for i in range(args.nprocs)]
    results = []
    for proc in procs:
        out, err = proc.communicate(timeout=900)
        if proc.returncode != 0:
            print(err[-4000:], file=sys.stderr)
            raise SystemExit("worker failed")
        results.append(json.loads(out.strip().splitlines()[-1]))

    ref = single_process_reference()
    assert 0 < ref["fused"]["safe_sum"] < 1024, "must discriminate"
    assert 0 < ref["adaptive"]["safe_sum"] < 1024, "must discriminate"
    assert ref["explore"]["count"] > 0
    for res in results:
        assert res["n_devices"] == args.nprocs, res
        for phase in ("fused", "adaptive", "explore", "extended",
                      "train"):
            assert res[phase] == ref[phase], (phase, res[phase], ref[phase])
    assert sum(r["coordinator"] for r in results) == 1
    print("multiprocess dryrun OK: {} processes x 1 device agree "
          "bit-for-bit with the single-process run on all phases "
          "(fused safe_sum={}, adaptive safe_sum={}, explore count={}, "
          "train loss={:.6g})".format(
              args.nprocs, ref["fused"]["safe_sum"],
              ref["adaptive"]["safe_sum"], ref["explore"]["count"],
              ref["train"]["loss"]))


if __name__ == "__main__":
    main()
