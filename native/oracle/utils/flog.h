/* No-op flog shim for the reference-oracle build: the reference's logger
 * (core/src/utils/flog.h) requires fmtlib, absent from this image. The DSP
 * headers only log diagnostics (one flog::debug in rational_resampler.h),
 * so a swallow-everything shim keeps the oracle silent. Original code. */
#pragma once

#include <exception>
#include <string>

namespace flog {
    template <typename... Args> inline void debug(const std::string&, Args&&...) {}
    template <typename... Args> inline void info(const std::string&, Args&&...) {}
    template <typename... Args> inline void warn(const std::string&, Args&&...) {}
    template <typename... Args> inline void error(const std::string&, Args&&...) {}
    inline void exception(const std::exception&) {}
    inline void exception() {}
}
