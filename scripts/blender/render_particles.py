"""Blender import helper: re-imports the exported per-frame particle OBJ
sequence on frame change for point-cloud rendering (the workflow served by
the reference's src/blender/render_particles.py; this is an independent
implementation against the bpy API).

Usage: open Blender, set PARTICLE_DIR below, run this script in the text
editor, then scrub/play the timeline. Each frame-change swaps the vertex
cloud of a single cached mesh object named PARTICLE_OBJECT.
"""

import os

import bpy

PARTICLE_DIR = bpy.path.abspath("//bakefiles")
PARTICLE_OBJECT = "flip_particles"


def _load_positions(path):
    verts = []
    with open(path, "r") as f:
        for line in f:
            if line.startswith("v "):
                _, x, y, z = line.split()[:4]
                verts.append((float(x), float(y), float(z)))
    return verts


def _ensure_object():
    obj = bpy.data.objects.get(PARTICLE_OBJECT)
    if obj is None:
        mesh = bpy.data.meshes.new(PARTICLE_OBJECT + "_mesh")
        obj = bpy.data.objects.new(PARTICLE_OBJECT, mesh)
        bpy.context.collection.objects.link(obj)
    return obj


def update_particles(scene):
    frame = scene.frame_current
    path = os.path.join(PARTICLE_DIR, f"{frame:04d}.obj")
    if not os.path.exists(path):
        return
    verts = _load_positions(path)
    obj = _ensure_object()
    old_mesh = obj.data
    mesh = bpy.data.meshes.new(PARTICLE_OBJECT + "_mesh")
    mesh.from_pydata(verts, [], [])
    mesh.update()
    obj.data = mesh
    if old_mesh.users == 0:
        bpy.data.meshes.remove(old_mesh)


def register():
    for handler in list(bpy.app.handlers.frame_change_post):
        if handler.__name__ == "update_particles":
            bpy.app.handlers.frame_change_post.remove(handler)
    bpy.app.handlers.frame_change_post.append(update_particles)


if __name__ == "__main__":
    register()
    update_particles(bpy.context.scene)
