"""sailfish_tpu: a TPU-native lattice-Boltzmann CFD framework.

A ground-up JAX/XLA/Pallas rebuild with the scene/state API of
sailfish-team/sailfish (reference mounted at /root/reference): LBSim
subclasses + Subdomain geometry + node_type boundary conditions drive a
fused collide-and-propagate step over (optionally mesh-sharded) device
arrays instead of runtime-generated CUDA kernels.
"""

__version__ = '0.1.0'
