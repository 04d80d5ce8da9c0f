# Training subsystem for the learned mask estimator: data synthesis from
# speech/noise sources, SI-SDR + spectral losses, optax training loop.
