/* Header-only threading shim for the reference-oracle build, matching the
 * interface of core/src/utils/threading.h (whose implementation lives in a
 * .cpp we do not compile). The oracle drives blocks synchronously via
 * process() and never calls block::start(), but block.h must still compile.
 * Original code. */
#pragma once

#include <chrono>
#include <cstdint>
#include <functional>
#include <string>
#include <thread>
#include <utils/flog.h>

namespace threading {

    inline void sleep(int32_t ms) {
        std::this_thread::sleep_for(std::chrono::milliseconds(ms));
    }

    inline uint32_t getThreadHash() noexcept {
        return (uint32_t)std::hash<std::thread::id>{}(std::this_thread::get_id());
    }

    inline void setThreadName(const std::string&) {}
    inline std::string getThreadName() { return ""; }

    class thread {
    private:
        std::thread _t;

    public:
        thread(thread&&) = default;
        thread& operator=(thread&&) = default;
        thread() = default;

        template <typename F, typename... Args>
        thread(const std::string& name, F&& f, Args&&... args) {
            (void)name;
            auto wrapped = [f = std::forward<F>(f)](auto&&... inner) mutable {
                try {
                    std::invoke(f, std::forward<decltype(inner)>(inner)...);
                } catch (...) {
                }
            };
            _t = std::thread(wrapped, std::forward<Args>(args)...);
        }

        bool joinable() const { return _t.joinable(); }
        void join() { _t.join(); }
        void detach() { _t.detach(); }
        std::thread::native_handle_type native_handle() { return _t.native_handle(); }
    };
}
