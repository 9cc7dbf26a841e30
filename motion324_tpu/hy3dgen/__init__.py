"""hy3dgen-equivalent: image -> mesh -> textured mesh generation, TPU-native.

Mirrors the reference's embedded Hunyuan3D-2 pipeline (reference:
scripts/hy3dgen/): shape generation (flow-matching latent-set DiT + ShapeVAE +
volume decoding + marching cubes) and texture generation (multi-view rendering
via the Pallas rasterizer, multiview diffusion, UV back-projection and
inpainting).
"""
