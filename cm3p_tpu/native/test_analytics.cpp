// Unit tests for the analytics core (semantics ported from the reference's
// Rust test suite, /root/reference/visualizer/wasm/src/tests.rs: shapes,
// empty input, label ranges, seed determinism, normalization invariants,
// neighbor ordering).
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {
void cm3p_pca(const float*, size_t, size_t, uint32_t, float*);
void cm3p_kmeans(const float*, size_t, size_t, size_t, uint32_t, int8_t*);
void cm3p_kmeans_parallel(const float*, size_t, size_t, size_t, uint32_t, int, int8_t*);
void cm3p_normalize(const float*, size_t, size_t, float*);
void cm3p_normalize_parallel(const float*, size_t, size_t, int, float*);
size_t cm3p_knn(const float*, size_t, size_t, size_t, size_t, uint32_t*, float*);
size_t cm3p_kmeans_assign_chunk(const float*, size_t, size_t, const float*, size_t, size_t, size_t, int8_t*);
}

static int failures = 0;
#define CHECK(cond, msg)                                   \
    do {                                                   \
        if (!(cond)) {                                     \
            std::printf("FAIL: %s (%s)\n", msg, #cond);    \
            ++failures;                                    \
        }                                                  \
    } while (0)

static std::vector<float> make_clusters(size_t per_cluster, size_t d, float sep) {
    // two well-separated gaussian-ish blobs via LCG noise
    std::vector<float> out(2 * per_cluster * d);
    uint32_t s = 777;
    auto rnd = [&]() {
        s = s * 1664525u + 1013904223u;
        return (float)s / 4294967296.0f - 0.5f;
    };
    for (size_t i = 0; i < per_cluster; ++i)
        for (size_t j = 0; j < d; ++j) out[i * d + j] = rnd() * 0.1f;
    for (size_t i = per_cluster; i < 2 * per_cluster; ++i)
        for (size_t j = 0; j < d; ++j) out[i * d + j] = sep + rnd() * 0.1f;
    return out;
}

int main() {
    // --- PCA: shape + variance capture + determinism
    {
        size_t n = 60, d = 16;
        auto data = make_clusters(n / 2, d, 4.0f);
        std::vector<float> out1(n * 2), out2(n * 2);
        cm3p_pca(data.data(), n, d, 12345, out1.data());
        cm3p_pca(data.data(), n, d, 12345, out2.data());
        CHECK(std::memcmp(out1.data(), out2.data(), n * 2 * sizeof(float)) == 0, "pca deterministic");
        // first component separates the two blobs
        float mean_a = 0, mean_b = 0;
        for (size_t i = 0; i < n / 2; ++i) mean_a += out1[i * 2];
        for (size_t i = n / 2; i < n; ++i) mean_b += out1[i * 2];
        mean_a /= n / 2;
        mean_b /= n / 2;
        CHECK(std::fabs(mean_a - mean_b) > 1.0f, "pca separates clusters on PC1");
    }
    // --- PCA: empty input is a no-op
    {
        cm3p_pca(nullptr, 0, 0, 1, nullptr);
    }
    // --- kmeans: label range, determinism, cluster purity
    {
        size_t n = 80, d = 8, k = 2;
        auto data = make_clusters(n / 2, d, 5.0f);
        std::vector<int8_t> l1(n), l2(n), l3(n);
        cm3p_kmeans(data.data(), n, d, k, 42, l1.data());
        cm3p_kmeans(data.data(), n, d, k, 42, l2.data());
        cm3p_kmeans_parallel(data.data(), n, d, k, 42, 4, l3.data());
        CHECK(std::memcmp(l1.data(), l2.data(), n) == 0, "kmeans seed deterministic");
        CHECK(std::memcmp(l1.data(), l3.data(), n) == 0, "kmeans parallel matches serial");
        for (size_t i = 0; i < n; ++i) CHECK(l1[i] >= 0 && l1[i] < (int8_t)k, "labels in range");
        // both blobs get internally consistent labels
        for (size_t i = 1; i < n / 2; ++i) CHECK(l1[i] == l1[0], "cluster A pure");
        for (size_t i = n / 2 + 1; i < n; ++i) CHECK(l1[i] == l1[n / 2], "cluster B pure");
        CHECK(l1[0] != l1[n / 2], "clusters distinct");
    }
    // --- normalize: unit rows, zero rows stay zero, parallel == serial
    {
        size_t n = 33, d = 7;
        std::vector<float> data(n * d, 0.f);
        uint32_t s = 9;
        for (size_t i = 0; i < (n - 1) * d; ++i) {
            s = s * 1664525u + 1013904223u;
            data[i] = (float)s / 4294967296.0f - 0.5f;
        }
        std::vector<float> out(n * d), outp(n * d);
        cm3p_normalize(data.data(), n, d, out.data());
        cm3p_normalize_parallel(data.data(), n, d, 4, outp.data());
        CHECK(std::memcmp(out.data(), outp.data(), n * d * sizeof(float)) == 0, "normalize parallel matches");
        for (size_t i = 0; i + 1 < n; ++i) {
            float norm = 0;
            for (size_t j = 0; j < d; ++j) norm += out[i * d + j] * out[i * d + j];
            CHECK(std::fabs(norm - 1.0f) < 1e-4f, "row is unit norm");
        }
        for (size_t j = 0; j < d; ++j) CHECK(out[(n - 1) * d + j] == 0.f, "zero row stays zero");
    }
    // --- knn: ordering, excludes query, count
    {
        size_t n = 20, d = 4;
        std::vector<float> data(n * d);
        for (size_t i = 0; i < n; ++i) {
            // points on a circle: neighbors are adjacent angles
            float a = (float)i / n * 6.28318f;
            data[i * d] = std::cos(a);
            data[i * d + 1] = std::sin(a);
        }
        std::vector<float> norm(n * d);
        cm3p_normalize(data.data(), n, d, norm.data());
        std::vector<uint32_t> idx(5);
        std::vector<float> dist(5);
        size_t got = cm3p_knn(norm.data(), n, d, 0, 5, idx.data(), dist.data());
        CHECK(got == 5, "knn returns k neighbors");
        for (size_t i = 0; i < got; ++i) CHECK(idx[i] != 0, "query excluded");
        for (size_t i = 1; i < got; ++i) CHECK(dist[i] >= dist[i - 1], "distances ascending");
        CHECK(idx[0] == 1 || idx[0] == 19, "nearest is adjacent on circle");
    }
    // --- chunked assign matches full assign
    {
        size_t n = 50, d = 6, k = 3;
        auto data = make_clusters(n / 2, d, 3.0f);
        std::vector<float> cents(k * d);
        std::memcpy(cents.data(), data.data(), k * d * sizeof(float));
        std::vector<int8_t> full(n, 0), chunked(n, 0);
        cm3p_kmeans_assign_chunk(data.data(), n, d, cents.data(), k, 0, n, full.data());
        cm3p_kmeans_assign_chunk(data.data(), n, d, cents.data(), k, 0, 25, chunked.data());
        cm3p_kmeans_assign_chunk(data.data(), n, d, cents.data(), k, 25, 50, chunked.data());
        CHECK(std::memcmp(full.data(), chunked.data(), n) == 0, "chunked assign == full assign");
    }

    if (failures == 0) {
        std::printf("ALL TESTS PASSED\n");
        return 0;
    }
    std::printf("%d FAILURES\n", failures);
    return 1;
}
