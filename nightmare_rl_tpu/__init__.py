"""nightmare_rl_tpu — a TPU-native legged-locomotion RL framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
nikisalli/nightmare_rl (CPU MuJoCo + torch rsl_rl):

- ``physics``   batched rigid-body physics (MuJoCo-semantics forward dynamics,
                PGS contact solver, implicitfast integrator) as pure JAX,
                vmapped over thousands of env instances under one jit.
- ``envs``      the nightmare_v3 hexapod task (obs/reward/termination parity
                with the reference env) and the anymal_c quadruped morphology.
- ``models``    Flax actor-critic networks.
- ``rl``        on-device PPO: rollout scan fused with the physics step, GAE,
                adaptive-KL learning rate — all in one jitted update.
- ``parallel``  device-mesh sharding (envs over 'data', replicated learner).
- ``engine``    classical FSM gait engine (analytic IK + Bezier swing) in JAX.
- ``ops``       Pallas TPU kernels for the contact-solver / batched-linalg
                hot loops.
- ``utils``     checkpointing (orbax), trajectory recording, metrics.
"""

__version__ = "0.1.0"
