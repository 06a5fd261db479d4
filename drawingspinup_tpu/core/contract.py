"""Per-uid dataset directory contract.

The three pipeline stages communicate exclusively through files on disk under
``<root>/<uid>/`` — identical layout to the reference
(``README.md:60-78,132-180``), so a user can point this framework at a
reference-produced dataset (or vice versa) at any stage boundary.
"""
from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import List, Optional

# canonical view names for the six-view multi-view stage
# (reference mvdiffusion/data/fixed_poses/nine_views + mv.py output layout)
VIEWS = ("front", "front_right", "right", "back", "left", "front_left")


@dataclass(frozen=True)
class UidPaths:
    """All file locations for one character uid."""

    root: str  # .../dataset/AnimatedDrawings/preprocessed
    uid: str

    # -- char/ (input drawing + stage-1 output) ----------------------------
    @property
    def char_dir(self) -> str:
        return os.path.join(self.root, self.uid, "char")

    @property
    def texture(self) -> str:
        return os.path.join(self.char_dir, "texture.png")

    @property
    def mask(self) -> str:
        return os.path.join(self.char_dir, "mask.png")

    @property
    def texture_with_bg(self) -> str:
        return os.path.join(self.char_dir, "texture_with_bg.png")

    @property
    def inpainted(self) -> str:
        return os.path.join(self.char_dir, "ffc_resnet_inpainted.png")

    # -- mv/ (stage-2a output) ---------------------------------------------
    def mv(self, kind: str, view: str) -> str:
        assert kind in ("color", "normal", "mask"), kind
        return os.path.join(self.root, self.uid, "mv", kind, f"{view}.png")

    @property
    def mv_dir(self) -> str:
        return os.path.join(self.root, self.uid, "mv")

    # -- mesh/ (stage-2b output) -------------------------------------------
    @property
    def mesh_dir(self) -> str:
        return os.path.join(self.root, self.uid, "mesh")

    def mesh_obj(self, it: int = 3000, mc: int = 512, faces: int = 50000,
                 cutting: bool = True, remeshed: bool = True, thinned: bool = False,
                 sheared: bool = True, color_bp: bool = True) -> str:
        """Mesh export filename mirroring the reference's name builder
        (``instant_nsr/systems/neus_ortho.py:182-200``):
        ``it{it}-mc{mc}-f{faces}[_c][_r][_t][_s][_cbp].obj``."""
        name = f"it{it}-mc{mc}-f{faces}"
        if cutting:
            name += "_c"
        if remeshed:
            name += "_r"
        if thinned:
            name += "_t"
        if sheared:
            name += "_s"
        if color_bp:
            name += "_cbp"
        return os.path.join(self.mesh_dir, name + ".obj")

    @property
    def fbx_dir(self) -> str:
        return os.path.join(self.mesh_dir, "fbx_files")

    # -- render passes (stage-3 intermediate) ------------------------------
    @property
    def render_dir(self) -> str:
        return os.path.join(self.mesh_dir, "blender_render")

    def action_dir(self, action: str) -> str:
        return os.path.join(self.render_dir, action)

    def frame(self, action: str, pass_name: str, idx: int) -> str:
        """pass_name in {color,pos,edge,res_stage1,res_stage2,...}; frames are
        1-based 4-digit (reference ``blender_animation.py`` frame naming)."""
        return os.path.join(self.action_dir(action), pass_name, f"{idx:04d}.png")

    def pass_dir(self, action: str, pass_name: str) -> str:
        return os.path.join(self.action_dir(action), pass_name)

    # -- gif/ (final output) -----------------------------------------------
    @property
    def gif_dir(self) -> str:
        return os.path.join(self.root, self.uid, "gif")

    def gif(self, action: str) -> str:
        return os.path.join(self.gif_dir, f"{action}.gif")


def load_uid_list(json_path: str) -> List[str]:
    with open(json_path) as f:
        return list(json.load(f))


def list_actions(paths: UidPaths) -> List[str]:
    """Action subdirectories present under blender_render/."""
    d = paths.render_dir
    if not os.path.isdir(d):
        return []
    return sorted(x for x in os.listdir(d) if os.path.isdir(os.path.join(d, x)))
