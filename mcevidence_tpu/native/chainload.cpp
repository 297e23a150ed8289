// Fast whitespace-delimited numeric table parser for MCMC chain files.
//
// The reference framework parses CosmoMC text chains with np.loadtxt
// (reference MCEvidence.py:560-565), the slowest part of its host pipeline
// for the Planck full-grid workload.  This parser mmaps the file and decodes
// doubles in a single pass (strtod on raw bytes, no line splitting, no Python
// object churn) — typically >10x faster than np.loadtxt.
//
// C ABI (used from Python via ctypes, see chainload.py):
//   chainload_parse(path, out, capacity, &nrows, &ncols)
//     out == NULL  : probe mode — count rows/cols only.
//     out != NULL  : fill out (row-major) up to `capacity` doubles.
//   returns number of doubles written/needed, or -1 on error
//   (unreadable file or ragged rows).
//
// Lines starting with '#' (after leading spaces) are comments.  Column count
// is fixed by the first data line; ragged rows are an error.

#include <cerrno>
#include <cstdint>
#include <cstdlib>
#include <cstring>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

inline bool is_space(char c) {
  return c == ' ' || c == '\t' || c == '\r';
}

}  // namespace

extern "C" long long chainload_parse(const char* path, double* out,
                                     long long capacity, long long* nrows,
                                     long long* ncols) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size == 0) {
    ::close(fd);
    return -1;
  }
  size_t size = static_cast<size_t>(st.st_size);
  const char* data = static_cast<const char*>(
      mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0));
  ::close(fd);
  if (data == MAP_FAILED) return -1;
  madvise(const_cast<char*>(data), size, MADV_SEQUENTIAL);

  long long rows = 0, cols = 0, written = 0;
  bool ok = true;
  const char* p = data;
  const char* end = data + size;

  while (p < end && ok) {
    while (p < end && is_space(*p)) ++p;
    if (p < end && *p == '\n') {  // blank line
      ++p;
      continue;
    }
    if (p < end && *p == '#') {  // comment line
      while (p < end && *p != '\n') ++p;
      continue;
    }
    if (p >= end) break;

    // one data row
    long long row_cols = 0;
    while (p < end && *p != '\n') {
      while (p < end && is_space(*p)) ++p;
      if (p >= end || *p == '\n') break;
      char* next = nullptr;
      errno = 0;
      double v = strtod(p, &next);
      if (next == p) {  // unparsable token
        ok = false;
        break;
      }
      if (out != nullptr) {
        if (written >= capacity) {
          ok = false;
          break;
        }
        out[written] = v;
      }
      ++written;
      ++row_cols;
      p = next;
    }
    if (p < end && *p == '\n') ++p;
    if (!ok) break;
    if (row_cols > 0) {
      if (cols == 0) {
        cols = row_cols;
      } else if (row_cols != cols) {  // ragged row
        ok = false;
        break;
      }
      ++rows;
    }
  }

  munmap(const_cast<char*>(data), size);
  if (!ok) return -1;
  *nrows = rows;
  *ncols = cols;
  return written;
}
