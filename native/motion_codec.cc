// Motion archive codec: packed binary clip store for fast bulk loading.
//
// The reference loads AMASS via Python pickles + a multiprocessing fan-out
// (phc/utils/motion_lib_base.py:179-323) — minutes for large datasets. This
// codec defines a flat binary format purpose-built for the TPU host path:
// one header, per-clip metadata, then raw little-endian float32 payloads in
// exactly the layout MotionData wants (frames concatenated per field), so
// loading is one mmap + pointer fixups and feeding the device is a single
// contiguous H2D transfer per field.
//
// Format (all little-endian):
//   magic  u64 "PULSEMTN"
//   version u32, num_clips u32, num_joints u32, reserved u32
//   per clip: fps f32, num_frames u32
//   payload: for each clip, contiguous:
//       local_rotation  [T, J, 4] f32 (xyzw)
//       root_translation[T, 3]    f32
//
// Exposed as a C ABI for ctypes; build with tools/build_native.sh.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr uint64_t kMagic = 0x4e544d45534c5550ull;  // "PULSEMTN"
constexpr uint32_t kVersion = 1;

struct Header {
  uint64_t magic;
  uint32_t version;
  uint32_t num_clips;
  uint32_t num_joints;
  uint32_t reserved;
};

struct ClipMeta {
  float fps;
  uint32_t num_frames;
};

struct Archive {
  void* map = nullptr;
  size_t map_size = 0;
  const Header* header = nullptr;
  const ClipMeta* clips = nullptr;
  const float* payload = nullptr;
};

size_t clip_floats(const ClipMeta& m, uint32_t J) {
  return static_cast<size_t>(m.num_frames) * (static_cast<size_t>(J) * 4 + 3);
}

}  // namespace

extern "C" {

// ---- writing -------------------------------------------------------------

// Create an archive from in-memory clips. rotations[i] points at
// [T_i, J, 4] f32, translations[i] at [T_i, 3] f32.
int motion_archive_write(const char* path, uint32_t num_clips,
                         uint32_t num_joints, const float* fps,
                         const uint32_t* num_frames,
                         const float* const* rotations,
                         const float* const* translations) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  Header h{kMagic, kVersion, num_clips, num_joints, 0};
  if (fwrite(&h, sizeof(h), 1, f) != 1) { fclose(f); return -2; }
  for (uint32_t i = 0; i < num_clips; ++i) {
    ClipMeta m{fps[i], num_frames[i]};
    if (fwrite(&m, sizeof(m), 1, f) != 1) { fclose(f); return -3; }
  }
  for (uint32_t i = 0; i < num_clips; ++i) {
    size_t rot_n = static_cast<size_t>(num_frames[i]) * num_joints * 4;
    size_t trans_n = static_cast<size_t>(num_frames[i]) * 3;
    if (fwrite(rotations[i], sizeof(float), rot_n, f) != rot_n) {
      fclose(f);
      return -4;
    }
    if (fwrite(translations[i], sizeof(float), trans_n, f) != trans_n) {
      fclose(f);
      return -5;
    }
  }
  fclose(f);
  return 0;
}

// ---- reading -------------------------------------------------------------

void* motion_archive_open(const char* path) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) { close(fd); return nullptr; }
  void* map = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  close(fd);
  if (map == MAP_FAILED) return nullptr;

  auto* a = new Archive();
  a->map = map;
  a->map_size = st.st_size;
  a->header = reinterpret_cast<const Header*>(map);
  if (a->header->magic != kMagic || a->header->version != kVersion) {
    munmap(map, st.st_size);
    delete a;
    return nullptr;
  }
  a->clips = reinterpret_cast<const ClipMeta*>(
      static_cast<const char*>(map) + sizeof(Header));
  a->payload = reinterpret_cast<const float*>(a->clips + a->header->num_clips);
  return a;
}

uint32_t motion_archive_num_clips(void* handle) {
  return static_cast<Archive*>(handle)->header->num_clips;
}

uint32_t motion_archive_num_joints(void* handle) {
  return static_cast<Archive*>(handle)->header->num_joints;
}

uint32_t motion_archive_num_frames(void* handle, uint32_t clip) {
  return static_cast<Archive*>(handle)->clips[clip].num_frames;
}

float motion_archive_fps(void* handle, uint32_t clip) {
  return static_cast<Archive*>(handle)->clips[clip].fps;
}

// Copy a clip's data into caller buffers (rotation [T,J,4], translation [T,3]).
int motion_archive_read_clip(void* handle, uint32_t clip, float* rotation_out,
                             float* translation_out) {
  auto* a = static_cast<Archive*>(handle);
  const Header* h = a->header;
  if (clip >= h->num_clips) return -1;
  size_t offset = 0;
  for (uint32_t i = 0; i < clip; ++i) offset += clip_floats(a->clips[i], h->num_joints);
  const ClipMeta& m = a->clips[clip];
  size_t rot_n = static_cast<size_t>(m.num_frames) * h->num_joints * 4;
  size_t trans_n = static_cast<size_t>(m.num_frames) * 3;
  std::memcpy(rotation_out, a->payload + offset, rot_n * sizeof(float));
  std::memcpy(translation_out, a->payload + offset + rot_n,
              trans_n * sizeof(float));
  return 0;
}

// Bulk path: concatenate every clip's rotations/translations into two
// contiguous caller buffers (total_frames rows each) — feeds MotionData's
// flat device layout in two H2D copies.
int motion_archive_read_all(void* handle, float* rotations_out,
                            float* translations_out) {
  auto* a = static_cast<Archive*>(handle);
  const Header* h = a->header;
  size_t offset = 0, rot_row = 0, trans_row = 0;
  size_t Jr = static_cast<size_t>(h->num_joints) * 4;
  for (uint32_t i = 0; i < h->num_clips; ++i) {
    const ClipMeta& m = a->clips[i];
    size_t rot_n = static_cast<size_t>(m.num_frames) * Jr;
    size_t trans_n = static_cast<size_t>(m.num_frames) * 3;
    std::memcpy(rotations_out + rot_row, a->payload + offset,
                rot_n * sizeof(float));
    std::memcpy(translations_out + trans_row, a->payload + offset + rot_n,
                trans_n * sizeof(float));
    offset += rot_n + trans_n;
    rot_row += rot_n;
    trans_row += trans_n;
  }
  return 0;
}

void motion_archive_close(void* handle) {
  auto* a = static_cast<Archive*>(handle);
  munmap(a->map, a->map_size);
  delete a;
}

}  // extern "C"
