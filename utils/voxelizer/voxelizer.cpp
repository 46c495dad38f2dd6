// STL -> dense numpy bool voxel array for sailfish_tpu geometry setup.
//
// TPU-native counterpart of the reference's cvmlcpp-based voxelizer
// (reference utils/voxelizer/voxelizer.cpp:1-92, io.hpp): same CLI and
// on-disk formats (<base>.npy bool array + <base>.config JSON consumed by
// sailfish_tpu.converter.CoordinateConverter), but implemented from
// scratch with watertight parity-count ray casting (no vendored library).
//
// Usage: voxelizer <STL file> <output_base> [voxel_size]
//   voxel_size is relative to the geometry scaled to unit length along its
//   longest axis (default 1/200 -> ~200 voxels; reference default equal).
//
// Output array semantics: true (1) = solid/wall node, false (0) = fluid,
// shape (nz, ny, nx) with one padding layer of solid on every face.
//
// Build: make   (g++ -O2 -fopenmp)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

struct V3 {
    double x, y, z;
};

struct Tri {
    V3 a, b, c;
};

static bool read_stl(const std::string& path, std::vector<Tri>* tris) {
    std::ifstream in(path, std::ios::binary);
    if (!in) return false;
    char header[80];
    in.read(header, 80);
    if (!in) return false;

    // Heuristic: ASCII STL starts with "solid" and contains "facet".
    in.seekg(0);
    std::string start(6, '\0');
    in.read(&start[0], 6);
    bool is_ascii = start.rfind("solid", 0) == 0;
    if (is_ascii) {
        // confirm by looking for "facet" in the first 1KB
        char buf[1024] = {0};
        in.read(buf, sizeof(buf) - 1);
        is_ascii = strstr(buf, "facet") != nullptr;
    }
    in.clear();
    in.seekg(0);

    if (is_ascii) {
        std::string tok;
        std::vector<V3> verts;
        while (in >> tok) {
            if (tok == "vertex") {
                V3 v;
                in >> v.x >> v.y >> v.z;
                verts.push_back(v);
                if (verts.size() == 3) {
                    tris->push_back({verts[0], verts[1], verts[2]});
                    verts.clear();
                }
            }
        }
        return !tris->empty();
    }

    in.seekg(80);
    uint32_t n = 0;
    in.read(reinterpret_cast<char*>(&n), 4);
    tris->reserve(n);
    for (uint32_t i = 0; i < n; ++i) {
        float data[12];
        in.read(reinterpret_cast<char*>(data), sizeof(data));
        uint16_t attr;
        in.read(reinterpret_cast<char*>(&attr), 2);
        if (!in) return false;
        Tri t;
        t.a = {data[3], data[4], data[5]};
        t.b = {data[6], data[7], data[8]};
        t.c = {data[9], data[10], data[11]};
        tris->push_back(t);
    }
    return !tris->empty();
}

// Ray along +x from (ox, oy, oz): returns the x of the crossing with the
// triangle, or NaN. 2D point-in-triangle in the (y, z) plane.
static double ray_x_hit(const Tri& t, double oy, double oz) {
    const double y0 = t.a.y - oy, z0 = t.a.z - oz;
    const double y1 = t.b.y - oy, z1 = t.b.z - oz;
    const double y2 = t.c.y - oy, z2 = t.c.z - oz;
    // signed areas of the three sub-triangles with the origin
    const double d0 = y0 * z1 - y1 * z0;
    const double d1 = y1 * z2 - y2 * z1;
    const double d2 = y2 * z0 - y0 * z2;
    const bool has_neg = (d0 < 0) || (d1 < 0) || (d2 < 0);
    const bool has_pos = (d0 > 0) || (d1 > 0) || (d2 > 0);
    if (has_neg && has_pos) return NAN;
    const double denom = d0 + d1 + d2;
    if (denom == 0.0) return NAN;  // degenerate / edge-on
    // barycentric interpolation of x
    const double bx = (d1 * t.a.x + d2 * t.b.x + d0 * t.c.x) / denom;
    return bx;
}

static void write_npy(const std::string& fname,
                      const std::vector<uint8_t>& data,
                      size_t nz, size_t ny, size_t nx) {
    std::ofstream out(fname, std::ios::binary);
    out.write("\x93NUMPY\x01\x00", 8);
    char dict[192];
    snprintf(dict, sizeof(dict),
             "{'descr': '|b1', 'fortran_order': False, "
             "'shape': (%zu, %zu, %zu), }", nz, ny, nx);
    size_t len = strlen(dict);
    size_t total = ((len + 10) / 64 + 1) * 64;
    uint16_t dlen = static_cast<uint16_t>(total - 10);
    out.write(reinterpret_cast<char*>(&dlen), 2);
    out.write(dict, len);
    for (size_t i = len; i < total - 10 - 1; ++i) out.put(' ');
    out.put('\n');
    out.write(reinterpret_cast<const char*>(data.data()), data.size());
}

int main(int argc, char** argv) {
    if (argc < 3) {
        std::cerr << "Usage: voxelizer <STL file> <output_base> "
                     "[voxel_size]\n";
        return -1;
    }
    const std::string stl_path = argv[1];
    const std::string out_base = argv[2];
    double voxel_size = 1.0 / 200.0;
    if (argc >= 4) voxel_size = atof(argv[3]);

    std::vector<Tri> tris;
    if (!read_stl(stl_path, &tris)) {
        std::cerr << "Failed to read STL file " << stl_path << "\n";
        return -1;
    }

    // Bounding box.
    V3 lo = tris[0].a, hi = tris[0].a;
    for (const Tri& t : tris) {
        for (const V3* v : {&t.a, &t.b, &t.c}) {
            lo.x = std::min(lo.x, v->x); hi.x = std::max(hi.x, v->x);
            lo.y = std::min(lo.y, v->y); hi.y = std::max(hi.y, v->y);
            lo.z = std::min(lo.z, v->z); hi.z = std::max(hi.z, v->z);
        }
    }
    const double ex = hi.x - lo.x, ey = hi.y - lo.y, ez = hi.z - lo.z;
    const double longest = std::max(ex, std::max(ey, ez));
    const double pitch = voxel_size * longest;  // physical voxel size
    const int pad = 1;

    const size_t nx = static_cast<size_t>(std::ceil(ex / pitch)) + 2 * pad;
    const size_t ny = static_cast<size_t>(std::ceil(ey / pitch)) + 2 * pad;
    const size_t nz = static_cast<size_t>(std::ceil(ez / pitch)) + 2 * pad;

    // true = solid; initialize everything solid, carve out the inside...
    // no: the STL interior is the SOLID obstacle in sailfish convention?
    // The reference marks inside=kFluid, outside=kWall: the STL describes
    // the fluid volume (e.g. a pipe's lumen). Same here: inside -> fluid.
    std::vector<uint8_t> vox(nx * ny * nz, 1);

    // Parity-count ray casting along +x per (y, z) row of voxel centers.
    // A small deterministic jitter avoids rays passing exactly through
    // vertices/edges.
    const double eps = 1e-9 * longest + 1e-12;
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic, 4)
#endif
    for (long long zi = 0; zi < static_cast<long long>(nz); ++zi) {
        std::vector<double> hits;
        for (size_t yi = 0; yi < ny; ++yi) {
            const double oy = lo.y + (static_cast<double>(yi) - pad + 0.5)
                * pitch + eps;
            const double oz = lo.z + (static_cast<double>(zi) - pad + 0.5)
                * pitch + eps;
            hits.clear();
            for (const Tri& t : tris) {
                const double h = ray_x_hit(t, oy, oz);
                if (!std::isnan(h)) hits.push_back(h);
            }
            if (hits.size() < 2) continue;
            std::sort(hits.begin(), hits.end());
            // dedupe near-identical crossings (shared edges)
            hits.erase(std::unique(hits.begin(), hits.end(),
                                   [&](double a, double b) {
                                       return std::fabs(a - b)
                                           < 1e-7 * longest;
                                   }),
                       hits.end());
            for (size_t k = 0; k + 1 < hits.size(); k += 2) {
                const double x0 = hits[k], x1 = hits[k + 1];
                long i0 = static_cast<long>(
                    std::ceil((x0 - lo.x) / pitch - 0.5)) + pad;
                long i1 = static_cast<long>(
                    std::floor((x1 - lo.x) / pitch - 0.5)) + pad;
                i0 = std::max(i0, 0L);
                i1 = std::min(i1, static_cast<long>(nx) - 1);
                for (long xi = i0; xi <= i1; ++xi) {
                    vox[(static_cast<size_t>(zi) * ny + yi) * nx + xi] = 0;
                }
            }
        }
    }

    size_t fluid = std::count(vox.begin(), vox.end(), 0);
    std::cout << "Nodes total: " << vox.size() << " active: "
              << std::round(fluid / static_cast<double>(vox.size())
                            * 10000) / 100.0 << "%\n";
    std::cout << "Lattice size: " << nx << " " << ny << " " << nz << "\n";

    write_npy(out_base + ".npy", vox, nz, ny, nx);

    std::ofstream config(out_base + ".config");
    config << "{\"bounding_box\": ["
           << "[" << lo.x << ", " << hi.x << "], "
           << "[" << lo.y << ", " << hi.y << "], "
           << "[" << lo.z << ", " << hi.z << "]],"
           << "\"padding\": [1, 1, 1, 1, 1, 1],"
           << "\"axes\": \"xyz\","
           << "\"size\": [" << nz << ", " << ny << ", " << nx << "]}";
    return 0;
}
