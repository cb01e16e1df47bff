// Native peak-store builder: the data-loader hot path of DiaData.
//
// Fills the role the reference delegates to native code (numba transpose,
// alphadia/raw_data/bruker.py:156-274; rust DIAData::from_arrays,
// ng_mapper.py:24-51): re-sorting tens of millions of peaks into the
// (slot, coarse-bin, cycle, m/z) slab layout with ghost-peak duplication
// and building the cell offset index.
//
// Algorithm: one counting sort over cell keys (O(N), parallel count +
// prefix + scatter) instead of numpy argsort (O(N log N) single-thread).
// Within a cell the original per-spectrum m/z order is preserved by a
// stable scatter, keeping peaks m/z-ascending per (slot, bin, cycle).
//
// Exposed via ctypes (alphadia_tpu/native/__init__.py); built with
//   g++ -O3 -march=native -fopenmp -shared -fPIC
// and falling back to the numpy implementation when unavailable.

#include <atomic>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// Phase 1: per-peak cell keys + ghost counting.
// keys buffer must hold 3*n_peaks entries (canonical + up to 2 ghosts).
// Returns total number of stored peaks (canonical + ghosts).
int64_t peakstore_count(
    const float* mz, int64_t n_peaks,
    const int64_t* spec_start,  // n_spectra+1 offsets into peak arrays
    int32_t n_spectra, int32_t n_slots, int32_t n_cycles,
    double bin_mz_min, double bin_width, int32_t n_bins, double ghost,
    int64_t* keys,        // out: 3*n_peaks (key of each stored entry)
    int64_t* src_index,   // out: 3*n_peaks (source peak of each entry)
    uint8_t* is_ghost     // out: 3*n_peaks
) {
    std::atomic<int64_t> cursor{0};

#pragma omp parallel for schedule(dynamic, 64)
    for (int32_t s = 0; s < n_spectra; ++s) {
        int64_t a = spec_start[s];
        int64_t b = spec_start[s + 1];
        int64_t slot = s % n_slots;
        int64_t cycle = s / n_slots;
        // local staging to keep per-spectrum order contiguous
        std::vector<int64_t> lk, li;
        std::vector<uint8_t> lg;
        lk.reserve((b - a) * 2);
        li.reserve((b - a) * 2);
        lg.reserve((b - a) * 2);
        for (int64_t i = a; i < b; ++i) {
            double m = mz[i];
            int64_t bin = (int64_t)((m - bin_mz_min) / bin_width);
            if (bin < 0) bin = 0;
            if (bin >= n_bins) bin = n_bins - 1;
            int64_t base = (slot * n_bins + bin) * n_cycles + cycle;
            lk.push_back(base);
            li.push_back(i);
            lg.push_back(0);
            int64_t up = (int64_t)((m + ghost - bin_mz_min) / bin_width);
            if (up >= n_bins) up = n_bins - 1;
            if (up != bin) {
                lk.push_back((slot * n_bins + up) * n_cycles + cycle);
                li.push_back(i);
                lg.push_back(1);
            }
            int64_t dn = (int64_t)((m - ghost - bin_mz_min) / bin_width);
            if (dn < 0) dn = 0;
            if (dn != bin) {
                lk.push_back((slot * n_bins + dn) * n_cycles + cycle);
                li.push_back(i);
                lg.push_back(1);
            }
        }
        int64_t off = cursor.fetch_add((int64_t)lk.size());
        std::memcpy(keys + off, lk.data(), lk.size() * sizeof(int64_t));
        std::memcpy(src_index + off, li.data(), li.size() * sizeof(int64_t));
        std::memcpy(is_ghost + off, lg.data(), lg.size() * sizeof(uint8_t));
    }
    return cursor.load();
}

// Phase 2 core: counting sort by cell key -> sorted peak arrays + cell
// index. scanbin/out_scanbin are nullable (the 3D path passes nullptr;
// the 4D timsTOF path carries the mobility scan bin through the sort).
static void scatter_impl(
    const float* mz, const float* intensity, const int32_t* scanbin,
    const int64_t* keys, const int64_t* src_index, const uint8_t* is_ghost,
    int64_t n_total, int64_t n_cells,
    float* out_mz, float* out_int, uint8_t* out_ghost, int32_t* out_scanbin,
    int64_t* cell_off  // workspace+output: n_cells+1, zero-initialized
) {
    for (int64_t i = 0; i < n_total; ++i) cell_off[keys[i] + 1]++;
    for (int64_t c = 0; c < n_cells; ++c) cell_off[c + 1] += cell_off[c];

    std::vector<int64_t> cursor(cell_off, cell_off + n_cells);
    // stable scatter: entries were produced per-spectrum in m/z order and
    // per (slot,bin,cycle) only one spectrum contributes, so sequential
    // scatter keeps m/z ascending within each cell
    for (int64_t i = 0; i < n_total; ++i) {
        int64_t pos = cursor[keys[i]]++;
        int64_t src = src_index[i];
        out_mz[pos] = mz[src];
        out_int[pos] = intensity[src];
        out_ghost[pos] = is_ghost[i];
        if (scanbin) out_scanbin[pos] = scanbin[src];
    }
}

// Phase 2: counting sort by cell key -> sorted peak arrays + cell index.
// cell_start has n_cells+1 entries (n_cells = n_slots*n_bins*n_cycles).
void peakstore_scatter(
    const float* mz, const float* intensity,
    const int64_t* keys, const int64_t* src_index, const uint8_t* is_ghost,
    int64_t n_total, int64_t n_cells,
    float* out_mz, float* out_int, uint8_t* out_ghost,
    int64_t* cell_off
) {
    scatter_impl(mz, intensity, nullptr, keys, src_index, is_ghost, n_total,
                 n_cells, out_mz, out_int, out_ghost, nullptr, cell_off);
}

// Phase 2 (4D variant): also scatters the per-peak mobility scan bin so
// the timsTOF path uses the same native builder (reference role: the
// Bruker transpose, bruker.py:156-274, which carries the scan dimension).
void peakstore_scatter_sb(
    const float* mz, const float* intensity, const int32_t* scanbin,
    const int64_t* keys, const int64_t* src_index, const uint8_t* is_ghost,
    int64_t n_total, int64_t n_cells,
    float* out_mz, float* out_int, uint8_t* out_ghost, int32_t* out_scanbin,
    int64_t* cell_off
) {
    scatter_impl(mz, intensity, scanbin, keys, src_index, is_ghost, n_total,
                 n_cells, out_mz, out_int, out_ghost, out_scanbin, cell_off);
}

int32_t peakstore_version() { return 2; }

}  // extern "C"
