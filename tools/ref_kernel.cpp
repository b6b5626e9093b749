// Reference-speed oracle kernel: the pyDEM Cython wavefront semantics
// (cyutils.pyx:35-226) as plain C++, used ONLY for test-oracle runs and for
// measuring an honest "reference implementation" baseline on this machine
// (the reference ships a Python-2-era prebuilt .so and no Cython in this
// image).  Not part of the framework's compute path.
//
// Build: g++ -O3 -shared -fPIC -o ref_kernel.so ref_kernel.cpp
#include <cstdint>
#include <cstring>

extern "C" {

static inline int on_edge(int64_t id, int64_t n_rows, int64_t n_cols) {
    if (id < n_cols) return 1;
    if (id >= n_cols * n_rows - n_cols) return 1;
    if (id % n_cols == 0) return 1;
    if (id % n_cols == n_cols - 1) return 1;
    return 0;
}

// area/done/ids are modified in place; ids_scratch must be a caller-provided
// buffer of n_ids bytes.
void drain_area(double *area, uint8_t *done, uint8_t *ids, uint8_t *ids_scratch,
                const int32_t *col_indptr, const int32_t *col_indices,
                const double *col_data, const int32_t *row_indptr,
                const int32_t *row_indices, int64_t n_rows, int64_t n_cols,
                int64_t n_ids, double *edge_todo, int do_edge_todo,
                double *edge_todo_no_mask, int do_edge_todo_no_mask,
                int skip_edge) {
    uint8_t *cur = ids, *next = ids_scratch;
    for (;;) {
        for (int64_t i = 0; i < n_ids; ++i)
            if (cur[i]) done[i] = 1;
        std::memset(next, 0, n_ids);
        for (int64_t i = 0; i < n_ids; ++i) {
            if (!cur[i]) continue;
            for (int32_t p = col_indptr[i]; p < col_indptr[i + 1]; ++p) {
                int64_t j = col_indices[p];
                double w = col_data[p];
                if ((skip_edge || done[j]) && on_edge(j, n_rows, n_cols))
                    continue;
                area[j] += area[i] * w;
                if (do_edge_todo) edge_todo[j] += edge_todo[i] * w;
                if (do_edge_todo_no_mask)
                    edge_todo_no_mask[j] += edge_todo_no_mask[i] * w;
                int wait = 0;
                for (int32_t k = row_indptr[j]; k < row_indptr[j + 1]; ++k) {
                    if (done[row_indices[k]] < 1) { wait = 1; break; }
                }
                if (!wait) next[j] = 1;
                if (do_edge_todo) done[i] = 1;
            }
        }
        if (std::memcmp(cur, next, n_ids) == 0) break;
        uint8_t *t = cur; cur = next; next = t;
    }
    if (cur != ids) std::memcpy(ids, cur, n_ids);
}

void drain_connections(uint8_t *arr, uint8_t *ids, uint8_t *ids_scratch,
                       const int32_t *indptr, const int32_t *indices,
                       int64_t n_ids, uint8_t set_to) {
    uint8_t *cur = ids, *next = ids_scratch;
    for (;;) {
        std::memset(next, 0, n_ids);
        for (int64_t i = 0; i < n_ids; ++i) {
            if (!cur[i]) continue;
            for (int32_t p = indptr[i]; p < indptr[i + 1]; ++p) {
                int64_t j = indices[p];
                if (arr[j] != set_to) next[j] = 1;
                arr[j] = set_to;
            }
        }
        if (std::memcmp(cur, next, n_ids) == 0) break;
        uint8_t *t = cur; cur = next; next = t;
    }
}

}  // extern "C"
