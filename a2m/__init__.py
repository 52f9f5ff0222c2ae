"""a2m — a TPU-native audio-to-motion framework (JAX / XLA / Pallas / pjit).

A ground-up rebuild of the capabilities of the PATS audio-to-gesture GAN
reference (Xukai-UoA/Audio-to-Motion-Generation), designed TPU-first:

* :mod:`a2m.audio` — log-mel frontends as MXU matmul pipelines + fused Pallas kernels
* :mod:`a2m.data` — PATS HDF5 pipeline, sliding windows, normalization, samplers
* :mod:`a2m.nn` — flax building blocks; graph convs in dense (einsum) form
* :mod:`a2m.models` — generator / discriminator + motion losses
* :mod:`a2m.train` — jitted GAN train steps, dynamic controller, orbax checkpoints
* :mod:`a2m.parallel` — device mesh + GSPMD shardings
* :mod:`a2m.eval` — PCK / L2 metrics, benchmark harness
* :mod:`a2m.viz` — skeleton video rendering CLI
"""

__version__ = '0.1.0'
