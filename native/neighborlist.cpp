// Cell-list neighbor search for molecular graphs (native runtime component).
//
// Replaces the O(N^2) numpy distance-matrix path of the reference
// (kgcnn/graph/preprocessor.py:255 SetRange / graph/adj.py:466) with an
// O(N) spatial-hash build + O(27 N rho) scan, parallelized with OpenMP.
// This is the host-side hot loop of MD inference (the neighbor list is
// rebuilt every step, kgcnn/moldyn/base.py) and of dataset preprocessing.
//
// Contract (mirrors gcnn_keras_tpu.graph.preprocess.set_range semantics):
// for each receiver i, all senders j != i with |x_i - x_j| <= cutoff,
// capped at the max_neighbors closest, emitted sorted by (receiver, sender).
//
// Build: g++ -O3 -fopenmp -shared -fPIC neighborlist.cpp -o _libneighborlist.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

// Returns the number of pairs written (<= n * max_neighbors), or -1 on
// invalid arguments. out_pairs has shape (n * max_neighbors, 2) int64,
// out_dist (n * max_neighbors) float64, both caller-allocated.
long long neighbor_list_cell(const double* xyz, long long n, double cutoff,
                             long long max_neighbors, long long* out_pairs,
                             double* out_dist) {
    if (n <= 0 || cutoff <= 0.0 || max_neighbors <= 0) return -1;
    const double c2 = cutoff * cutoff;
    const long long k = max_neighbors;

    // bounding box
    double lo[3] = {xyz[0], xyz[1], xyz[2]};
    double hi[3] = {xyz[0], xyz[1], xyz[2]};
    for (long long i = 1; i < n; ++i) {
        for (int d = 0; d < 3; ++d) {
            const double v = xyz[3 * i + d];
            if (v < lo[d]) lo[d] = v;
            if (v > hi[d]) hi[d] = v;
        }
    }
    long long dims[3];
    for (int d = 0; d < 3; ++d) {
        dims[d] = (long long)std::floor((hi[d] - lo[d]) / cutoff) + 1;
        if (dims[d] < 1) dims[d] = 1;
    }
    // guard against degenerate grids (huge empty volumes)
    const long long max_cells = 1 << 22;  // 4M cells
    long long ncells = dims[0] * dims[1] * dims[2];
    bool use_cells = ncells > 0 && ncells <= max_cells && n > 32;

    // counting-sort atoms into cells
    std::vector<long long> cell_of(n), cell_start, order(n);
    if (use_cells) {
        cell_start.assign(ncells + 1, 0);
        for (long long i = 0; i < n; ++i) {
            long long cx = (long long)((xyz[3 * i] - lo[0]) / cutoff);
            long long cy = (long long)((xyz[3 * i + 1] - lo[1]) / cutoff);
            long long cz = (long long)((xyz[3 * i + 2] - lo[2]) / cutoff);
            if (cx >= dims[0]) cx = dims[0] - 1;
            if (cy >= dims[1]) cy = dims[1] - 1;
            if (cz >= dims[2]) cz = dims[2] - 1;
            cell_of[i] = (cx * dims[1] + cy) * dims[2] + cz;
            cell_start[cell_of[i] + 1] += 1;
        }
        for (long long c = 0; c < ncells; ++c) cell_start[c + 1] += cell_start[c];
        std::vector<long long> cursor(cell_start.begin(), cell_start.end() - 1);
        for (long long i = 0; i < n; ++i) order[cursor[cell_of[i]]++] = i;
    }

    // per-receiver candidate scan into fixed slots [i*k, (i+1)*k)
    std::vector<long long> count(n, 0);
    std::vector<long long> send_buf(n * k);
    std::vector<double> dist_buf(n * k);

#if defined(_OPENMP)
#pragma omp parallel for schedule(dynamic, 16)
#endif
    for (long long i = 0; i < n; ++i) {
        // local candidate collection (may exceed k; keep k closest)
        std::vector<std::pair<double, long long>> cand;
        const double xi = xyz[3 * i], yi = xyz[3 * i + 1], zi = xyz[3 * i + 2];
        auto consider = [&](long long j) {
            if (j == i) return;
            const double dx = xi - xyz[3 * j];
            const double dy = yi - xyz[3 * j + 1];
            const double dz = zi - xyz[3 * j + 2];
            const double d2 = dx * dx + dy * dy + dz * dz;
            if (d2 < c2) cand.emplace_back(d2, j);  // strict <, like adj.py:537
        };
        if (use_cells) {
            const long long c = cell_of[i];
            const long long cz = c % dims[2];
            const long long cy = (c / dims[2]) % dims[1];
            const long long cx = c / (dims[1] * dims[2]);
            for (long long ox = -1; ox <= 1; ++ox)
                for (long long oy = -1; oy <= 1; ++oy)
                    for (long long oz = -1; oz <= 1; ++oz) {
                        const long long nx = cx + ox, ny = cy + oy, nz = cz + oz;
                        if (nx < 0 || ny < 0 || nz < 0 || nx >= dims[0] ||
                            ny >= dims[1] || nz >= dims[2])
                            continue;
                        const long long cc = (nx * dims[1] + ny) * dims[2] + nz;
                        for (long long s = cell_start[cc]; s < cell_start[cc + 1]; ++s)
                            consider(order[s]);
                    }
        } else {
            for (long long j = 0; j < n; ++j) consider(j);
        }
        long long m = (long long)cand.size();
        if (m > k) {
            // keep k closest; stable within equal distances by sender id
            std::nth_element(cand.begin(), cand.begin() + k, cand.end());
            m = k;
        }
        // emit sorted by sender id for deterministic (recv, send) order
        std::sort(cand.begin(), cand.begin() + m,
                  [](const std::pair<double, long long>& a,
                     const std::pair<double, long long>& b) {
                      return a.second < b.second;
                  });
        for (long long t = 0; t < m; ++t) {
            send_buf[i * k + t] = cand[t].second;
            dist_buf[i * k + t] = std::sqrt(cand[t].first);
        }
        count[i] = m;
    }

    // compact into the output arrays (already (recv, send)-sorted)
    long long w = 0;
    for (long long i = 0; i < n; ++i) {
        for (long long t = 0; t < count[i]; ++t) {
            out_pairs[2 * w] = i;
            out_pairs[2 * w + 1] = send_buf[i * k + t];
            out_dist[w] = dist_buf[i * k + t];
            ++w;
        }
    }
    return w;
}

// Periodic variant: senders are replicated over the given lattice-image
// shifts (computed host-side from cutoff / plane spacings, exactly like the
// numpy path and the reference's range_neighbour_lattice,
// kgcnn/graph/geom.py:172). For each receiver i (central cell) it emits all
// (j, image) with |x_i - (x_j + shift)| <= cutoff, excluding the self pair
// (j == i in the central image), capped at the max_neighbors closest.
//
// capacity is the number of pair slots provided in out_*. Returns the
// number of pairs written, or -(required) if capacity was insufficient
// (caller reallocates and retries — used for the unlimited-cap mode).
long long neighbor_list_periodic(const double* xyz, long long n,
                                 const double* shifts,
                                 const long long* images, long long n_img,
                                 double cutoff, long long max_neighbors,
                                 long long central_img, long long capacity,
                                 long long* out_pairs, long long* out_images,
                                 double* out_dist) {
    if (n <= 0 || n_img <= 0 || cutoff <= 0.0) return 0;
    const double c2 = cutoff * cutoff;
    const long long total = n * n_img;  // replicated sender count

    // replicated sender positions, tagged (j, image)
    std::vector<double> pos(3 * total);
    for (long long s = 0; s < n_img; ++s) {
        const double sx = shifts[3 * s], sy = shifts[3 * s + 1],
                     sz = shifts[3 * s + 2];
        for (long long j = 0; j < n; ++j) {
            const long long t = s * n + j;
            pos[3 * t] = xyz[3 * j] + sx;
            pos[3 * t + 1] = xyz[3 * j + 1] + sy;
            pos[3 * t + 2] = xyz[3 * j + 2] + sz;
        }
    }

    // cell grid over the replicated senders
    double lo[3] = {pos[0], pos[1], pos[2]}, hi[3] = {pos[0], pos[1], pos[2]};
    for (long long t = 1; t < total; ++t)
        for (int d = 0; d < 3; ++d) {
            const double v = pos[3 * t + d];
            if (v < lo[d]) lo[d] = v;
            if (v > hi[d]) hi[d] = v;
        }
    long long dims[3];
    for (int d = 0; d < 3; ++d) {
        dims[d] = (long long)std::floor((hi[d] - lo[d]) / cutoff) + 1;
        if (dims[d] < 1) dims[d] = 1;
    }
    const long long max_cells = 1 << 22;
    long long ncells = dims[0] * dims[1] * dims[2];
    const bool use_cells = ncells > 0 && ncells <= max_cells && total > 64;

    std::vector<long long> cell_start, order(total);
    std::vector<long long> cell_of;
    if (use_cells) {
        cell_of.resize(total);
        cell_start.assign(ncells + 1, 0);
        for (long long t = 0; t < total; ++t) {
            long long cx = (long long)((pos[3 * t] - lo[0]) / cutoff);
            long long cy = (long long)((pos[3 * t + 1] - lo[1]) / cutoff);
            long long cz = (long long)((pos[3 * t + 2] - lo[2]) / cutoff);
            if (cx >= dims[0]) cx = dims[0] - 1;
            if (cy >= dims[1]) cy = dims[1] - 1;
            if (cz >= dims[2]) cz = dims[2] - 1;
            cell_of[t] = (cx * dims[1] + cy) * dims[2] + cz;
            cell_start[cell_of[t] + 1] += 1;
        }
        for (long long c = 0; c < ncells; ++c) cell_start[c + 1] += cell_start[c];
        std::vector<long long> cursor(cell_start.begin(), cell_start.end() - 1);
        for (long long t = 0; t < total; ++t) order[cursor[cell_of[t]]++] = t;
    }

    struct Hit { double d2; long long j, img; };
    std::vector<std::vector<Hit>> per_recv(n);

#if defined(_OPENMP)
#pragma omp parallel for schedule(dynamic, 8)
#endif
    for (long long i = 0; i < n; ++i) {
        auto& hits = per_recv[i];
        const double xi = xyz[3 * i], yi = xyz[3 * i + 1], zi = xyz[3 * i + 2];
        auto consider = [&](long long t) {
            const long long img = t / n, j = t % n;
            if (j == i && img == central_img) return;  // self in central cell
            const double dx = xi - pos[3 * t];
            const double dy = yi - pos[3 * t + 1];
            const double dz = zi - pos[3 * t + 2];
            const double d2 = dx * dx + dy * dy + dz * dz;
            if (d2 <= c2) hits.push_back({d2, j, img});  // <= like geom.py:172
        };
        if (use_cells) {
            long long cx = (long long)((xi - lo[0]) / cutoff);
            long long cy = (long long)((yi - lo[1]) / cutoff);
            long long cz = (long long)((zi - lo[2]) / cutoff);
            for (long long ox = -1; ox <= 1; ++ox)
                for (long long oy = -1; oy <= 1; ++oy)
                    for (long long oz = -1; oz <= 1; ++oz) {
                        const long long nx = cx + ox, ny = cy + oy, nz = cz + oz;
                        if (nx < 0 || ny < 0 || nz < 0 || nx >= dims[0] ||
                            ny >= dims[1] || nz >= dims[2])
                            continue;
                        const long long cc = (nx * dims[1] + ny) * dims[2] + nz;
                        for (long long s = cell_start[cc]; s < cell_start[cc + 1]; ++s)
                            consider(order[s]);
                    }
        } else {
            for (long long t = 0; t < total; ++t) consider(t);
        }
        if (max_neighbors > 0 && (long long)hits.size() > max_neighbors) {
            std::nth_element(hits.begin(), hits.begin() + max_neighbors,
                             hits.end(),
                             [](const Hit& a, const Hit& b) { return a.d2 < b.d2; });
            hits.resize(max_neighbors);
        }
        // deterministic (sender, image) order within each receiver
        std::sort(hits.begin(), hits.end(), [](const Hit& a, const Hit& b) {
            return a.j != b.j ? a.j < b.j : a.img < b.img;
        });
    }

    long long required = 0;
    for (long long i = 0; i < n; ++i) required += (long long)per_recv[i].size();
    if (required > capacity) return -required;

    long long w = 0;
    for (long long i = 0; i < n; ++i) {
        for (const Hit& h : per_recv[i]) {
            out_pairs[2 * w] = i;
            out_pairs[2 * w + 1] = h.j;
            out_images[3 * w] = images[3 * h.img];
            out_images[3 * w + 1] = images[3 * h.img + 1];
            out_images[3 * w + 2] = images[3 * h.img + 2];
            out_dist[w] = std::sqrt(h.d2);
            ++w;
        }
    }
    return w;
}

int neighbor_list_has_openmp() {
#if defined(_OPENMP)
    return 1;
#else
    return 0;
#endif
}

}  // extern "C"
