// Timing harness for the C++ reference (compiled against the read-only
// sources in /root/reference/src). Runs the default bunny-in-sphere scene
// (same parameters as the reference's main.cpp) and prints per-frame
// wall-clock so BASELINE.md can record measured numbers.
#include <chrono>
#include <cstdio>
#include <iostream>

#include "fluidsimulation.h"
#include "trianglemesh.h"

int main(int argc, char **argv) {
    int numFrames = argc > 1 ? atoi(argv[1]) : 10;
    int res = argc > 2 ? atoi(argv[2]) : 64;

    FluidSimulation fluidsim;
    float dx = 1.0f / res;
    fluidsim.initialize(res, res, res, dx);

    TriangleMesh boundaryMesh, liquidMesh;
    if (!boundaryMesh.loadPLY("/root/reference/sample_meshes/sphere_large.ply")) {
        std::cerr << "boundary mesh load failed\n";
        return 1;
    }
    fluidsim.addBoundary(boundaryMesh, true);
    if (!liquidMesh.loadPLY("/root/reference/sample_meshes/stanford_bunny.ply")) {
        std::cerr << "liquid mesh load failed\n";
        return 1;
    }
    fluidsim.addLiquid(liquidMesh);
    fluidsim.setViscosity(5.0f);
    fluidsim.setGravity(0.0f, -9.81f, 0.0f);

    fprintf(stderr, "# particles: %zu\n", fluidsim.particles.size());

    float timestep = 0.01f;
    double total = 0.0;
    for (int frame = 0; frame < numFrames; frame++) {
        auto t0 = std::chrono::steady_clock::now();
        fluidsim.advance(timestep);
        auto t1 = std::chrono::steady_clock::now();
        double s = std::chrono::duration<double>(t1 - t0).count();
        total += s;
        fprintf(stderr, "FRAME %d %.4f s\n", frame, s);
    }
    fprintf(stderr, "TOTAL %d frames: %.4f s (%.4f s/frame)\n", numFrames,
            total, total / numFrames);
    return 0;
}
