"""motion324_tpu — a TPU-native (JAX/XLA/Pallas/pjit) feedforward video->4D motion
reconstruction framework.

Capabilities mirror Inception3D/Motion324 (see SURVEY.md): given a textured 3D mesh and a
monocular RGB video, a point-cloud/video transformer predicts per-frame 3D positions for
every mesh vertex; the deformed mesh sequence is exported as an animated GLB.

Subpackages
-----------
- ``config``    : YAML + CLI-override configuration system.
- ``ops``       : Pallas TPU kernels and pure-JAX ops (flash attention, embeddings).
- ``models``    : network definitions (motion transformer, DINOv2 encoder).
- ``parallel``  : device-mesh / sharding utilities (GSPMD data/tensor parallel).
- ``training``  : train step, optimizer, checkpointing, fault tolerance.
- ``inference`` : sliding-window long-video pipeline, trajectory smoothing.
- ``data``      : Dyscene16k-style dataset, surface sampling / barycentric tracking.
- ``io``        : mesh I/O (GLB/OBJ), animated-GLB morph-target export.
- ``hy3dgen``   : image->mesh->texture generation (Hunyuan3D-2-equivalent), TPU-native.
- ``evaluation``: Chamfer/F-score/IoU + video metric harness.
"""

__version__ = "0.1.0"
