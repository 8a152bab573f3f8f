// Native asynchronous frame loader for mageslam_tpu.
//
// Role parity: the reference's frame ingestion is native C++ — OpenCV
// VideoCapture feeding the pipeline synchronously (Apps/Console/console.cpp)
// plus pooled ImageData buffers (Image/ImageFactory.h). Here the native side
// owns file IO, decode of the mageslam_tpu capture format (io/capture.py
// layout), grayscale buffer pooling, optional bilinear resize, and a
// background prefetch thread with a bounded ring buffer, so the Python/JAX
// side never blocks on disk: by the time the device finishes frame i, frame
// i+1..i+depth are already resident.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).
//
// Build: make -C native   (produces libframe_loader.so)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

namespace {

#pragma pack(push, 1)
struct CaptureHeader {
    char magic[4];       // "MGTS"
    uint32_t version;
    uint32_t width;
    uint32_t height;
    float cam[16];
    char device[64];
};

struct FrameMeta {
    double timestamp;
    int64_t frame_id;
};
#pragma pack(pop)

struct Frame {
    FrameMeta meta;
    std::vector<uint8_t> pixels;  // out_width * out_height
};

// Bilinear resize, uint8 grayscale.
void resize_bilinear(const uint8_t* src, int sw, int sh,
                     uint8_t* dst, int dw, int dh) {
    if (sw == dw && sh == dh) {
        std::memcpy(dst, src, static_cast<size_t>(sw) * sh);
        return;
    }
    const float sx = static_cast<float>(sw) / dw;
    const float sy = static_cast<float>(sh) / dh;
    for (int y = 0; y < dh; ++y) {
        const float fy = (y + 0.5f) * sy - 0.5f;
        int y0 = static_cast<int>(fy);
        if (y0 < 0) y0 = 0;
        int y1 = y0 + 1 < sh ? y0 + 1 : sh - 1;
        const float wy = fy - y0;
        for (int x = 0; x < dw; ++x) {
            const float fx = (x + 0.5f) * sx - 0.5f;
            int x0 = static_cast<int>(fx);
            if (x0 < 0) x0 = 0;
            int x1 = x0 + 1 < sw ? x0 + 1 : sw - 1;
            const float wx = fx - x0;
            const float a = src[y0 * sw + x0] * (1 - wx) + src[y0 * sw + x1] * wx;
            const float b = src[y1 * sw + x0] * (1 - wx) + src[y1 * sw + x1] * wx;
            dst[y * dw + x] = static_cast<uint8_t>(a * (1 - wy) + b * wy + 0.5f);
        }
    }
}

class FrameLoader {
  public:
    FrameLoader(const char* path, int out_w, int out_h, int depth)
        : out_w_(out_w), out_h_(out_h), depth_(depth > 0 ? depth : 4) {
        file_ = std::fopen(path, "rb");
        if (!file_) { ok_ = false; return; }
        if (std::fread(&header_, sizeof(header_), 1, file_) != 1 ||
            std::memcmp(header_.magic, "MGTS", 4) != 0) {
            ok_ = false;
            std::fclose(file_);
            file_ = nullptr;
            return;
        }
        if (out_w_ <= 0) out_w_ = static_cast<int>(header_.width);
        if (out_h_ <= 0) out_h_ = static_cast<int>(header_.height);
        ok_ = true;
        worker_ = std::thread([this] { Run(); });
    }

    ~FrameLoader() {
        {
            std::lock_guard<std::mutex> lk(mu_);
            stop_ = true;
        }
        cv_space_.notify_all();
        cv_data_.notify_all();
        if (worker_.joinable()) worker_.join();
        if (file_) std::fclose(file_);
    }

    bool ok() const { return ok_; }
    const CaptureHeader& header() const { return header_; }
    int out_w() const { return out_w_; }
    int out_h() const { return out_h_; }

    // Returns 1 on success, 0 on end-of-stream.
    int Next(uint8_t* pixels, double* timestamp, int64_t* frame_id) {
        std::unique_lock<std::mutex> lk(mu_);
        cv_data_.wait(lk, [this] { return !queue_.empty() || done_ || stop_; });
        if (queue_.empty()) return 0;
        Frame f = std::move(queue_.front());
        queue_.erase(queue_.begin());
        lk.unlock();
        cv_space_.notify_one();
        std::memcpy(pixels, f.pixels.data(), f.pixels.size());
        *timestamp = f.meta.timestamp;
        *frame_id = f.meta.frame_id;
        return 1;
    }

  private:
    void Run() {
        const size_t in_n = static_cast<size_t>(header_.width) * header_.height;
        std::vector<uint8_t> raw(in_n);
        for (;;) {
            FrameMeta meta;
            if (std::fread(&meta, sizeof(meta), 1, file_) != 1) break;
            if (std::fread(raw.data(), 1, in_n, file_) != in_n) break;
            Frame f;
            f.meta = meta;
            f.pixels.resize(static_cast<size_t>(out_w_) * out_h_);
            resize_bilinear(raw.data(), header_.width, header_.height,
                            f.pixels.data(), out_w_, out_h_);
            std::unique_lock<std::mutex> lk(mu_);
            cv_space_.wait(lk, [this] {
                return queue_.size() < static_cast<size_t>(depth_) || stop_;
            });
            if (stop_) return;
            queue_.push_back(std::move(f));
            lk.unlock();
            cv_data_.notify_one();
        }
        {
            std::lock_guard<std::mutex> lk(mu_);
            done_ = true;
        }
        cv_data_.notify_all();
    }

    FILE* file_ = nullptr;
    CaptureHeader header_{};
    int out_w_, out_h_, depth_;
    bool ok_ = false;
    std::vector<Frame> queue_;
    std::mutex mu_;
    std::condition_variable cv_data_, cv_space_;
    std::thread worker_;
    bool done_ = false;
    bool stop_ = false;
};

}  // namespace

extern "C" {

void* frame_loader_open(const char* path, int out_w, int out_h, int depth) {
    auto* fl = new FrameLoader(path, out_w, out_h, depth);
    if (!fl->ok()) {
        delete fl;
        return nullptr;
    }
    return fl;
}

int frame_loader_dims(void* handle, int* w, int* h) {
    auto* fl = static_cast<FrameLoader*>(handle);
    *w = fl->out_w();
    *h = fl->out_h();
    return 1;
}

int frame_loader_camera(void* handle, float* cam16) {
    auto* fl = static_cast<FrameLoader*>(handle);
    std::memcpy(cam16, fl->header().cam, 16 * sizeof(float));
    return 1;
}

int frame_loader_next(void* handle, uint8_t* pixels, double* timestamp,
                      int64_t* frame_id) {
    return static_cast<FrameLoader*>(handle)->Next(pixels, timestamp, frame_id);
}

void frame_loader_close(void* handle) {
    delete static_cast<FrameLoader*>(handle);
}

}  // extern "C"
