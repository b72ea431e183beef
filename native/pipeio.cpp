// pipeio: double-buffered frame transport between a media subprocess
// (ffmpeg rawvideo pipes) and the host inference loop.
//
// Role in the framework: the reference delegated all frame I/O to native
// code implicitly (libpng inside OpenCV workers, upscale_processing.py:263,
// 288).  The TPU pipeline instead streams raw frames over pipes
// (video/io.py FfmpegPipeSource/Sink); this library keeps those pipes
// saturated from dedicated C++ threads with a preallocated ring of frame
// buffers, so Python's read loop and the GIL never sit between ffmpeg and
// the device feed.  Single-producer/single-consumer per handle.
//
// Exposed as a plain C ABI for ctypes (no pybind11 dependency).

#include <atomic>
#include <chrono>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <new>
#include <thread>
#include <vector>

#include <errno.h>
#include <poll.h>
#include <unistd.h>

namespace {

struct Ring {
  size_t frame_bytes = 0;
  int n_buffers = 0;
  std::vector<std::vector<uint8_t>> buffers;
  // slot states advance: free -> filled -> free
  std::vector<bool> filled;
  int head = 0;  // next slot the thread works on
  int tail = 0;  // next slot the client works on
  int fd = -1;
  std::atomic<bool> eof{false};
  std::atomic<bool> error{false};
  std::atomic<bool> stop{false};
  std::mutex mu;
  std::condition_variable cv;
  std::thread worker;
  bool is_reader = false;

  Ring(int fd_, size_t fb, int nb, bool reader)
      : frame_bytes(fb), n_buffers(nb), fd(fd_), is_reader(reader) {
    buffers.resize(nb);
    for (auto &b : buffers) b.resize(fb);
    filled.assign(nb, false);
  }
};

// read exactly n bytes; returns bytes read (short count = EOF mid-frame),
// -1 on error.  Polls with a timeout so a stop request can interrupt a
// reader blocked on a silent pipe.
ssize_t read_full(int fd, uint8_t *dst, size_t n, const std::atomic<bool> &stop) {
  size_t got = 0;
  while (got < n) {
    struct pollfd pfd = {fd, POLLIN, 0};
    int pr = ::poll(&pfd, 1, 100);
    if (stop) return static_cast<ssize_t>(got);
    if (pr < 0) {
      if (errno == EINTR) continue;
      return -1;
    }
    if (pr == 0) continue;  // timeout, re-check stop
    ssize_t r = ::read(fd, dst + got, n - got);
    if (r == 0) break;  // EOF
    if (r < 0) {
      if (errno == EINTR) continue;
      return -1;
    }
    got += static_cast<size_t>(r);
  }
  return static_cast<ssize_t>(got);
}

ssize_t write_full(int fd, const uint8_t *src, size_t n,
                   const std::atomic<bool> &stop) {
  // poll-interruptible like read_full: a wedged encoder that stops
  // draining the pipe must not make close()/flush() hang forever —
  // the stop flag set by pipeio_close breaks the wait
  size_t put = 0;
  while (put < n) {
    struct pollfd pfd = {fd, POLLOUT, 0};
    int pr = ::poll(&pfd, 1, 100);
    if (stop) return static_cast<ssize_t>(put);
    if (pr < 0) {
      if (errno == EINTR) continue;
      return -1;
    }
    if (pr == 0) continue;  // timeout, re-check stop
    ssize_t w = ::write(fd, src + put, n - put);
    if (w < 0) {
      if (errno == EINTR) continue;
      return -1;
    }
    put += static_cast<size_t>(w);
  }
  return static_cast<ssize_t>(put);
}

void reader_loop(Ring *r) {
  for (;;) {
    int slot;
    {
      std::unique_lock<std::mutex> lk(r->mu);
      r->cv.wait(lk, [r] { return r->stop || !r->filled[r->head]; });
      if (r->stop) return;
      slot = r->head;
    }
    ssize_t got = read_full(r->fd, r->buffers[slot].data(), r->frame_bytes,
                            r->stop);
    std::lock_guard<std::mutex> lk(r->mu);
    if (r->stop) return;
    if (got < 0) {
      r->error = true;
    } else if (static_cast<size_t>(got) != r->frame_bytes) {
      if (got != 0) r->error = true;  // truncated frame
      r->eof = true;
    } else {
      r->filled[slot] = true;
      r->head = (r->head + 1) % r->n_buffers;
    }
    bool done = r->eof || r->error;
    r->cv.notify_all();
    if (done) return;
  }
}

void writer_loop(Ring *r) {
  for (;;) {
    int slot;
    {
      std::unique_lock<std::mutex> lk(r->mu);
      r->cv.wait(lk, [r] { return r->stop || r->filled[r->head]; });
      if (r->stop && !r->filled[r->head]) return;
      slot = r->head;
    }
    ssize_t put = write_full(r->fd, r->buffers[slot].data(), r->frame_bytes,
                             r->stop);
    std::lock_guard<std::mutex> lk(r->mu);
    if (put < 0) {
      r->error = true;
    } else if (static_cast<size_t>(put) != r->frame_bytes) {
      // interrupted by stop mid-frame: the sink is being torn down; mark
      // error so flush() does not report a clean drain
      r->error = true;
    } else {
      r->filled[slot] = false;
      r->head = (r->head + 1) % r->n_buffers;
    }
    r->cv.notify_all();
    if (r->error) return;
  }
}

}  // namespace

extern "C" {

void *pipeio_reader_open(int fd, size_t frame_bytes, int n_buffers) {
  if (frame_bytes == 0 || n_buffers < 2) return nullptr;
  Ring *r = new (std::nothrow) Ring(fd, frame_bytes, n_buffers, true);
  if (!r) return nullptr;
  r->worker = std::thread(reader_loop, r);
  return r;
}

// Blocks for the next filled frame.  Returns the slot index and sets *data,
// or -1 on EOF, -2 on error.  The slot stays owned by the caller until
// pipeio_reader_release.
long pipeio_reader_acquire(void *h, uint8_t **data) {
  Ring *r = static_cast<Ring *>(h);
  std::unique_lock<std::mutex> lk(r->mu);
  r->cv.wait(lk, [r] {
    return r->filled[r->tail] || r->eof || r->error;
  });
  if (r->filled[r->tail]) {
    *data = r->buffers[r->tail].data();
    return r->tail;
  }
  return r->error ? -2 : -1;
}

void pipeio_reader_release(void *h) {
  Ring *r = static_cast<Ring *>(h);
  std::lock_guard<std::mutex> lk(r->mu);
  r->filled[r->tail] = false;
  r->tail = (r->tail + 1) % r->n_buffers;
  r->cv.notify_all();
}

void *pipeio_writer_open(int fd, size_t frame_bytes, int n_buffers) {
  if (frame_bytes == 0 || n_buffers < 2) return nullptr;
  Ring *r = new (std::nothrow) Ring(fd, frame_bytes, n_buffers, false);
  if (!r) return nullptr;
  r->worker = std::thread(writer_loop, r);
  return r;
}

// Copies one frame into the ring (blocks while the ring is full).
// Returns 0 on success, -2 if the writer thread hit an error.
int pipeio_writer_submit(void *h, const uint8_t *data) {
  Ring *r = static_cast<Ring *>(h);
  std::unique_lock<std::mutex> lk(r->mu);
  r->cv.wait(lk, [r] { return !r->filled[r->tail] || r->error; });
  if (r->error) return -2;
  std::memcpy(r->buffers[r->tail].data(), data, r->frame_bytes);
  r->filled[r->tail] = true;
  r->tail = (r->tail + 1) % r->n_buffers;
  r->cv.notify_all();
  return 0;
}

// Waits until every submitted frame reached the pipe, at most timeout_ms
// (<=0 means a generous default).  0 ok, -1 timeout (encoder wedged and
// not draining — slots still filled), -2 writer error.  Bounded so that
// close() can always reach pipeio_close's stop flag (an unbounded wait
// here dead-locked against a stalled encoder: stop is only set AFTER
// flush returns).
int pipeio_writer_flush_timeout(void *h, long timeout_ms) {
  Ring *r = static_cast<Ring *>(h);
  if (timeout_ms <= 0) timeout_ms = 120000;
  std::unique_lock<std::mutex> lk(r->mu);
  bool done = r->cv.wait_for(
      lk, std::chrono::milliseconds(timeout_ms), [r] {
        if (r->error) return true;
        for (int i = 0; i < r->n_buffers; ++i)
          if (r->filled[i]) return false;
        return true;
      });
  if (r->error) return -2;
  return done ? 0 : -1;
}

// Back-compat alias (default timeout).
int pipeio_writer_flush(void *h) { return pipeio_writer_flush_timeout(h, 0); }

int pipeio_has_error(void *h) {
  Ring *r = static_cast<Ring *>(h);
  return r->error ? 1 : 0;
}

void pipeio_close(void *h) {
  Ring *r = static_cast<Ring *>(h);
  {
    std::lock_guard<std::mutex> lk(r->mu);
    r->stop = true;
    r->cv.notify_all();
  }
  if (r->worker.joinable()) r->worker.join();
  delete r;
}

}  // extern "C"
