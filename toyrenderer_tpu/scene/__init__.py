"""Scene & content pipeline: glTF loading, meshlets, global buffers, cache.

Host-side (numpy) counterpart of the reference's scene layer
(source/SceneLoading.cpp, source/Visual.cpp, source/Scene.cpp) — produces the
dense device arrays the jitted frame function consumes.
"""

from toyrenderer_tpu.scene.gltf import GltfDocument, load_gltf
from toyrenderer_tpu.scene.scenebuild import SceneBuffers, build_scene, load_scene
