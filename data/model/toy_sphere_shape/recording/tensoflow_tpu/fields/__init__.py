"""Field primitives: SDF/material/flow tensor fields, shaders, lights, MLPs."""
