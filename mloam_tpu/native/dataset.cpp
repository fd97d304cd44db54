// Native dataset runtime: point-cloud file decoding + async prefetch.
//
// Counterpart of the reference's host-side C++ I/O: the KITTI raw velodyne
// reader (estimator/src/kittiHelper.cpp:27-43), PCD loading in the offline
// tools (rosNodeRVHercules offline mode), and the producer threads feeding
// mutex-guarded frame queues (rosNodeSR.cpp:60-61). Here it is a small
// C-ABI library driven from Python via ctypes: a reader thread decodes and
// stages frames into a bounded ring while the device consumes them —
// keeping file I/O and float parsing off the Python hot path.
//
// Exposed C ABI:
//   ds_open(paths, n, format, capacity) -> handle   (starts prefetch thread)
//   ds_next(handle, buf, max_pts) -> n_pts          (blocks; 0 = end)
//   ds_close(handle)
//   ds_read_kitti_bin / ds_read_pcd                 (one-shot decoders)
//
// Formats: 0 = KITTI .bin (float32 x,y,z,intensity), 1 = PCD (ascii or
// binary, FIELDS x y z [intensity]).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <fstream>
#include <mutex>
#include <sstream>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Frame {
  std::vector<float> data;  // x,y,z,i packed
  int64_t n_pts = 0;
};

int64_t read_kitti_bin(const char* path, float* out, int64_t max_pts) {
  std::ifstream f(path, std::ios::binary | std::ios::ate);
  if (!f) return -1;
  const int64_t bytes = f.tellg();
  int64_t n = bytes / (4 * sizeof(float));
  if (n > max_pts) n = max_pts;
  f.seekg(0);
  f.read(reinterpret_cast<char*>(out), n * 4 * sizeof(float));
  return f ? n : -1;
}

// Minimal PCD parser: header (FIELDS/SIZE/TYPE/COUNT/POINTS/DATA), then
// ascii or binary payload. Maps x,y,z,intensity -> 4 floats; missing
// intensity -> 0.
int64_t read_pcd(const char* path, float* out, int64_t max_pts) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return -1;
  std::string line;
  std::vector<std::string> fields;
  std::vector<int> sizes, counts;
  std::vector<char> types;
  int64_t n_pts = 0;
  std::string data_mode;
  while (std::getline(f, line)) {
    std::istringstream ss(line);
    std::string key;
    ss >> key;
    if (key == "FIELDS") {
      std::string v;
      while (ss >> v) fields.push_back(v);
    } else if (key == "SIZE") {
      int v;
      while (ss >> v) sizes.push_back(v);
    } else if (key == "TYPE") {
      char v;
      while (ss >> v) types.push_back(v);
    } else if (key == "COUNT") {
      int v;
      while (ss >> v) counts.push_back(v);
    } else if (key == "POINTS") {
      ss >> n_pts;
    } else if (key == "DATA") {
      ss >> data_mode;
      break;
    }
  }
  if (fields.empty() || n_pts <= 0) return -1;
  if (sizes.size() != fields.size()) sizes.assign(fields.size(), 4);
  if (counts.size() != fields.size()) counts.assign(fields.size(), 1);
  if (types.size() != fields.size()) types.assign(fields.size(), 'F');
  int ix = -1, iy = -1, iz = -1, ii = -1;
  for (size_t k = 0; k < fields.size(); ++k) {
    if (fields[k] == "x") ix = static_cast<int>(k);
    if (fields[k] == "y") iy = static_cast<int>(k);
    if (fields[k] == "z") iz = static_cast<int>(k);
    if (fields[k] == "intensity") ii = static_cast<int>(k);
  }
  if (ix < 0 || iy < 0 || iz < 0) return -1;
  if (n_pts > max_pts) n_pts = max_pts;

  if (data_mode == "ascii") {
    for (int64_t p = 0; p < n_pts; ++p) {
      if (!std::getline(f, line)) return p;
      std::istringstream ss(line);
      std::vector<float> vals(fields.size(), 0.f);
      for (size_t k = 0; k < fields.size(); ++k) ss >> vals[k];
      out[p * 4 + 0] = vals[ix];
      out[p * 4 + 1] = vals[iy];
      out[p * 4 + 2] = vals[iz];
      out[p * 4 + 3] = ii >= 0 ? vals[ii] : 0.f;
    }
    return n_pts;
  }
  if (data_mode == "binary") {
    int stride = 0;
    std::vector<int> offs(fields.size());
    for (size_t k = 0; k < fields.size(); ++k) {
      offs[k] = stride;
      stride += sizes[k] * counts[k];
    }
    std::vector<char> row(stride);
    for (int64_t p = 0; p < n_pts; ++p) {
      f.read(row.data(), stride);
      if (!f) return p;
      auto fget = [&](int k) -> float {
        if (k < 0) return 0.f;
        if (types[k] == 'F' && sizes[k] == 4) {
          float v;
          std::memcpy(&v, row.data() + offs[k], 4);
          return v;
        }
        if (types[k] == 'F' && sizes[k] == 8) {
          double v;
          std::memcpy(&v, row.data() + offs[k], 8);
          return static_cast<float>(v);
        }
        if (types[k] == 'U' && sizes[k] == 1) {
          return static_cast<float>(
              *reinterpret_cast<unsigned char*>(row.data() + offs[k]));
        }
        return 0.f;
      };
      out[p * 4 + 0] = fget(ix);
      out[p * 4 + 1] = fget(iy);
      out[p * 4 + 2] = fget(iz);
      out[p * 4 + 3] = fget(ii);
    }
    return n_pts;
  }
  return -1;  // binary_compressed unsupported
}

struct Dataset {
  std::vector<std::string> paths;
  int format = 0;
  int64_t max_pts = 0;
  size_t next_read = 0;

  std::deque<Frame> ring;
  size_t capacity = 4;
  std::mutex mu;
  std::condition_variable cv_can_produce, cv_can_consume;
  std::atomic<bool> done{false};
  std::atomic<bool> stop{false};
  std::thread worker;

  void run() {
    for (size_t i = 0; i < paths.size() && !stop.load(); ++i) {
      Frame fr;
      fr.data.resize(static_cast<size_t>(max_pts) * 4);
      int64_t n = format == 0
                      ? read_kitti_bin(paths[i].c_str(), fr.data.data(), max_pts)
                      : read_pcd(paths[i].c_str(), fr.data.data(), max_pts);
      fr.n_pts = n < 0 ? 0 : n;
      std::unique_lock<std::mutex> lk(mu);
      cv_can_produce.wait(lk, [&] { return ring.size() < capacity || stop; });
      if (stop) break;
      ring.push_back(std::move(fr));
      cv_can_consume.notify_one();
    }
    done = true;
    std::lock_guard<std::mutex> lk(mu);
    cv_can_consume.notify_all();
  }
};

}  // namespace

extern "C" {

void* ds_open(const char** paths, int64_t n_paths, int format,
              int64_t max_pts, int64_t capacity) {
  auto* ds = new Dataset();
  ds->paths.assign(paths, paths + n_paths);
  ds->format = format;
  ds->max_pts = max_pts;
  ds->capacity = static_cast<size_t>(capacity > 0 ? capacity : 4);
  ds->worker = std::thread([ds] { ds->run(); });
  return ds;
}

int64_t ds_next(void* handle, float* out) {
  auto* ds = static_cast<Dataset*>(handle);
  std::unique_lock<std::mutex> lk(ds->mu);
  ds->cv_can_consume.wait(lk, [&] { return !ds->ring.empty() || ds->done; });
  if (ds->ring.empty()) return 0;
  Frame fr = std::move(ds->ring.front());
  ds->ring.pop_front();
  ds->cv_can_produce.notify_one();
  lk.unlock();
  std::memcpy(out, fr.data.data(),
              static_cast<size_t>(fr.n_pts) * 4 * sizeof(float));
  return fr.n_pts;
}

void ds_close(void* handle) {
  auto* ds = static_cast<Dataset*>(handle);
  ds->stop = true;
  ds->cv_can_produce.notify_all();
  if (ds->worker.joinable()) ds->worker.join();
  delete ds;
}

int64_t ds_read_kitti_bin(const char* path, float* out, int64_t max_pts) {
  return read_kitti_bin(path, out, max_pts);
}

int64_t ds_read_pcd(const char* path, float* out, int64_t max_pts) {
  return read_pcd(path, out, max_pts);
}

}  // extern "C"
