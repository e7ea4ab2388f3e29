from tlab_tpu.particles.core import (  # noqa: F401
    ParticleState, ParticleProps, interpolate_to_particles,
    particles_to_field, particle_rhs, init_particles)
